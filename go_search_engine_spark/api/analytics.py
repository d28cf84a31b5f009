"""In-process search-analytics service behind ``GET /analytics``.

Mirrors the reference's analytics dashboard
(/root/reference/internal/analytics/service.go:75-105 GetDashboardData;
api/analytics_handlers.go:12 the handler): every search records a
SearchEvent in a bounded in-memory buffer, and the dashboard aggregates
the last 24h / 7d windows driver-side.

Driver-side by design: the reference's service is the same in-memory
loop over its event slice. The *Spark-scale* analytics path in this repo
is the events-table aggregation suite (entry_queries `analytics_*`
gates) and the streaming analytics sink (streaming/indexer.py) -- this
module only serves the live ops dashboard for one server process, so
the event buffer is bounded (default 50k events ~= a day of serving at
0.6 qps) and the aggregation is O(buffer), never a Spark job per GET.
"""

from __future__ import annotations

import threading
import time
from collections import Counter, deque
from dataclasses import dataclass


@dataclass
class SearchEvent:
    index_name: str
    query: str
    took_ms: float
    n_results: int
    search_type: str  # "search" | "multi_search"
    ts: float


class AnalyticsService:
    def __init__(self, max_events: int = 50_000):
        self._events: deque[SearchEvent] = deque(maxlen=max_events)
        self._lock = threading.Lock()

    def record(
        self,
        index_name: str,
        query: str,
        took_ms: float,
        n_results: int,
        search_type: str = "search",
    ) -> None:
        ev = SearchEvent(
            index_name=index_name,
            query=query,
            took_ms=float(took_ms),
            n_results=int(n_results),
            search_type=search_type,
            ts=time.time(),
        )
        with self._lock:
            self._events.append(ev)

    # -- dashboard ---------------------------------------------------------
    @staticmethod
    def _avg_ms(events: list[SearchEvent]) -> int:
        """Integer milliseconds (model/analytics.go:55 AvgResponseTime
        int64, Go Duration.Milliseconds truncates)."""
        if not events:
            return 0
        return int(sum(e.took_ms for e in events) / len(events))

    @staticmethod
    def _change_pct(current: int, previous: int) -> float:
        # service.go:131-140 calculateChangePercent
        if previous == 0:
            return 100.0 if current > 0 else 0.0
        return round((current - previous) / previous * 100.0, 2)

    @classmethod
    def _rt_change(cls, current: list, previous: list) -> str:
        # service.go:158-173 calculateResponseTimeChange: trend string,
        # 10% band around stable
        cur, prev = cls._avg_ms(current), cls._avg_ms(previous)
        if prev == 0:
            return "stable"
        change = (cur - prev) / prev
        if change > 0.1:
            return "up"
        if change < -0.1:
            return "down"
        return "stable"

    def dashboard(self, index_stats: list[dict] | None = None) -> dict:
        """AnalyticsDashboard, field-for-field the reference's shape
        (model/analytics.go:67-88 json tags; service.go:76-105
        GetDashboardData; pinned against api-spec.yaml /analytics by
        tests/test_api.py). Deviations, all value-level and deliberate:
        the reference hardcodes documents_change_count=156,
        indexes_change_count=2, cpu=23.0 and disk=45.0 as placeholders
        (service.go:192-206, :367-380) -- here the change counts are 0
        (no fake history) and cpu/disk/memory are real process/host
        readings."""
        now = time.time()
        with self._lock:
            events = list(self._events)
        last24 = [e for e in events if e.ts > now - 24 * 3600]
        week = [e for e in events if e.ts > now - 7 * 24 * 3600]
        prev_week = [
            e for e in events
            if now - 14 * 24 * 3600 < e.ts <= now - 7 * 24 * 3600
        ]

        # top 5 over the last week, trend "stable" (service.go:243-274:
        # the reference computes no real trend either)
        popular = Counter(e.query for e in week if e.query).most_common(5)
        search_counts = Counter(e.index_name for e in week)
        # buckets <=25 / <=50 / <=100 / 100+ ms (service.go:315-345)
        b = [0, 0, 0, 0]
        for e in last24:
            # int() first: the reference buckets Duration.Milliseconds(),
            # a truncated integer -- a 25.4 ms event belongs in 0-25
            ms = int(e.took_ms)
            b[0 if ms <= 25 else 1 if ms <= 50 else 2 if ms <= 100 else 3] += 1
        n24 = len(last24)
        pct = [round(x / n24 * 100, 2) if n24 else 0.0 for x in b]
        # wall-clock-hour grouping, ALWAYS 24 entries (service.go:209-231)
        hourly: dict[int, list[SearchEvent]] = {}
        for e in last24:
            hourly.setdefault(time.localtime(e.ts).tm_hour, []).append(e)
        type_counts = Counter(e.search_type for e in last24)

        index_stats = index_stats or []
        return {
            "total_searches": n24,
            "searches_change_percent": self._change_pct(
                n24, len(prev_week)
            ),
            "avg_response_time": self._avg_ms(last24),
            "response_time_change": self._rt_change(last24, prev_week),
            "total_documents": sum(
                s.get("document_count", 0) for s in index_stats
            ),
            "documents_change_count": 0,
            "active_indexes": len(index_stats),
            "indexes_change_count": 0,
            "search_performance_24h": [
                {
                    "hour": h,
                    "search_count": len(hourly.get(h, [])),
                    "avg_response_time": self._avg_ms(hourly.get(h, [])),
                }
                for h in range(24)
            ],
            "popular_searches": [
                {"query": q, "search_count": c, "trend_change": "stable"}
                for q, c in popular
            ],
            "index_usage": [
                {
                    "index_name": s.get("name", s.get("index_name", "")),
                    "document_count": int(s.get("document_count", 0)),
                    "search_count": int(
                        search_counts.get(
                            s.get("name", s.get("index_name", "")), 0
                        )
                    ),
                    # reference sizes by doc count (service.go:297);
                    # callers may pass a real size_mb instead
                    "size_mb": float(
                        s.get("size_mb", s.get("document_count", 0) * 0.001)
                    ),
                }
                for s in index_stats
            ],
            "response_time_distribution": {
                "bucket_0_25ms": b[0],
                "bucket_25_50ms": b[1],
                "bucket_50_100ms": b[2],
                "bucket_100ms_plus": b[3],
                "percentage_0_25": pct[0],
                "percentage_25_50": pct[1],
                "percentage_50_100": pct[2],
                "percentage_100_plus": pct[3],
            },
            "search_types": {
                "exact_match": type_counts.get("exact_match", 0),
                "fuzzy_search": type_counts.get("fuzzy_search", 0),
                "filtered": type_counts.get("filtered", 0),
                "wildcard": type_counts.get("wildcard", 0),
            },
            "system_health": _system_health(),
        }


def determine_search_type(query: str, has_filters: bool) -> str:
    """Mirror of the reference's determineSearchType
    (api/search_handlers.go:223-241): filters win, then wildcard chars,
    then the single-longish-word fuzzy heuristic, else exact_match."""
    if has_filters:
        return "filtered"
    if "*" in query or "?" in query:
        return "wildcard"
    if not query:
        return "filtered"  # empty query with filters
    if len(query.split()) == 1 and len(query) > 3:
        return "fuzzy_search"
    return "exact_match"


def _system_health() -> dict:
    """SystemHealth shape (model/analytics.go:58-64). Real readings where
    the container exposes them (the reference hardcodes cpu/disk)."""
    mem = 0.0
    try:
        tot = avail = None
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    tot = float(line.split()[1])
                elif line.startswith("MemAvailable:"):
                    avail = float(line.split()[1])
        if tot and avail is not None:
            mem = round((tot - avail) / tot * 100.0, 1)
    except OSError:
        pass
    try:
        import os
        import shutil

        du = shutil.disk_usage("/")
        disk = round(du.used / du.total * 100.0, 1)
        cpu = round(
            min(100.0, os.getloadavg()[0] / (os.cpu_count() or 1) * 100.0), 1
        )
    except (OSError, AttributeError):
        # AttributeError: os.getloadavg does not exist on non-Unix
        # platforms -- GET /analytics must degrade, not 500
        disk = cpu = 0.0
    return {
        "memory_usage_percent": mem,
        "cpu_usage_percent": cpu,
        "disk_space_percent": disk,
        "index_health_percent": 100.0,
    }

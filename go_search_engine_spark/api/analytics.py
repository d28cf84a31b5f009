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
    def _avg_ms(events: list[SearchEvent]) -> float:
        if not events:
            return 0.0
        return round(sum(e.took_ms for e in events) / len(events), 3)

    @staticmethod
    def _change_pct(current: int, previous: int) -> float:
        # service.go:131-140 calculateChangePercent
        if previous == 0:
            return 100.0 if current > 0 else 0.0
        return round((current - previous) / previous * 100.0, 2)

    def dashboard(self, index_stats: list[dict] | None = None) -> dict:
        """AnalyticsDashboard shape (service.go:88-104): 24h totals +
        deltas vs the prior week, popular searches, per-index usage,
        latency distribution, search-type mix, hourly performance."""
        now = time.time()
        with self._lock:
            events = list(self._events)
        last24 = [e for e in events if e.ts > now - 24 * 3600]
        week = [e for e in events if e.ts > now - 7 * 24 * 3600]
        prev_week = [
            e for e in events
            if now - 14 * 24 * 3600 < e.ts <= now - 7 * 24 * 3600
        ]

        popular = Counter(e.query for e in week if e.query).most_common(10)
        usage = Counter(e.index_name for e in week).most_common()
        buckets = {"lt_10ms": 0, "10_50ms": 0, "50_200ms": 0, "gte_200ms": 0}
        for e in last24:
            if e.took_ms < 10:
                buckets["lt_10ms"] += 1
            elif e.took_ms < 50:
                buckets["10_50ms"] += 1
            elif e.took_ms < 200:
                buckets["50_200ms"] += 1
            else:
                buckets["gte_200ms"] += 1
        hourly: dict[int, list[SearchEvent]] = {}
        for e in last24:
            hourly.setdefault(int((now - e.ts) // 3600), []).append(e)

        index_stats = index_stats or []
        return {
            "total_searches": len(last24),
            "searches_change_percent": self._change_pct(
                len(last24), len(prev_week)
            ),
            "avg_response_time_ms": self._avg_ms(last24),
            "response_time_change_ms": round(
                self._avg_ms(last24) - self._avg_ms(prev_week), 3
            ),
            "total_documents": sum(s.get("document_count", 0) for s in index_stats),
            "active_indexes": len(index_stats),
            "search_performance_24h": [
                {
                    "hours_ago": h,
                    "searches": len(evs),
                    "avg_response_time_ms": self._avg_ms(evs),
                }
                for h, evs in sorted(hourly.items())
            ],
            "popular_searches": [
                {"query": q, "count": c} for q, c in popular
            ],
            "index_usage": [
                {"index_name": n, "searches": c} for n, c in usage
            ],
            "response_time_distribution": buckets,
            "search_types": dict(Counter(e.search_type for e in last24)),
        }

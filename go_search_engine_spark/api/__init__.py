"""REST + async-job surface over the engine (reference ``api/`` +
``internal/jobs``)."""

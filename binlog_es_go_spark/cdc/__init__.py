"""CDC pipeline: changelog sources -> apply core -> lake upsert.

Mirrors the reference's architecture insight (SURVEY.md §3.3): one apply
core fed by three key sources — the realtime tail (``pkg/realtime/loop.go``),
the bootstrap scan (``pkg/bootstrap/runner.go``), and dead-letter replay
(``cmd/binlog-es-go/main.go:503-561``).
"""

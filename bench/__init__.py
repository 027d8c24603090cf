"""Benchmark harnesses (bench.py at the repo root is the driver-run
headline script; this package holds the scaling / recall / latency /
GC / link-scale harnesses that write BENCH.md sections)."""

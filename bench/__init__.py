"""Benchmark helpers (regular package so it wins over bench.py in imports)."""

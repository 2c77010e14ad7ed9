"""Distributed operators: integrity (uniqueness/referential/presence),
one-pass column profiling + drift, audio invariants, dedup families,
similarity search, and text analysis."""

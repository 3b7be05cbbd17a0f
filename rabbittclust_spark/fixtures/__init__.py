"""Deterministic synthetic fixtures (FIXTURES.md family 1): webtext corpus
with planted exact/near/containment duplicates + ground truth."""

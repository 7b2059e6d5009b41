"""Operator library — each operator is a pure DataFrame transform or a
fit-then-transform pair (SURVEY §2.2-§2.7)."""

"""Column-expression helpers shared across operator modules."""

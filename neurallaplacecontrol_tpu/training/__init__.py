"""training subpackage (populated incrementally)."""

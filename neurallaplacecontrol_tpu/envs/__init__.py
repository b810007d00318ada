"""envs subpackage (populated incrementally)."""

"""planners subpackage (populated incrementally)."""

"""data subpackage (populated incrementally)."""

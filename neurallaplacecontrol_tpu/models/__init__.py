"""models subpackage (populated incrementally)."""

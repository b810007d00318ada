"""results subpackage (populated incrementally)."""

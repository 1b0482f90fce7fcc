"""X1-X6 extension declared queries (placeholder, filled next)."""

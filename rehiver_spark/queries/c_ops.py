"""C1-C18 relational-core declared queries (placeholder, filled next)."""

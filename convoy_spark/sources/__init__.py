"""Input surfaces (SURVEY §2.1)."""

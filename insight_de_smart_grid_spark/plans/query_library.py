"""Additional registered queries (filled in as operators land)."""

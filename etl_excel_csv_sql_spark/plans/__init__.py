"""Pipeline specs, settings catalog, and the named-query registry."""

"""Device-mesh construction and sharding rules."""

"""Device-mesh parallelism: sharding, halo exchange, tile scheduling."""

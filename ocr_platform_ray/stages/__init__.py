"""Ray Data stages: vectorized stateless transforms + stateful actor stages."""

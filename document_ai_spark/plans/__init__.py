"""Plans: the distributed extraction pipeline and its single-node oracle."""

"""Shared pure-python span semantics + Spark expression builders.

Every deterministic behavior that the golden tests compare on is
implemented exactly once in this package and imported by BOTH the
single-node oracle (plans/oracle.py) and the distributed pipeline's
Arrow UDFs (plans/pipeline.py) — parity by construction.
"""

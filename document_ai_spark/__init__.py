"""document_ai_spark — a from-scratch PySpark-native extraction engine.

Re-expresses the capabilities of the reference single-node invoice
extraction service (Ayushman1123/Document-ai-, snapshot at
/root/reference) as an idiomatic, distributed Spark DataFrame pipeline
over an interleaved text+media span table:

    documents_interleaved(doc_id: string,
                          spans: array<struct<kind, text, media_ref, offset>>)

Layout:
    constants   — thresholds / master dims / regex pattern surface
                  (mirrors reference backend/config.py and
                  backend/services/field_extractor.py:24-86)
    functions/  — pure-python span semantics shared by the single-node
                  oracle and the Arrow UDFs (parity by construction),
                  plus Spark Column expression builders
    sources/    — deterministic corpus generator + parquet readers
    operators/  — dedup / similarity / text-quality / multimodal ops
    plans/      — the flagship extraction pipeline + single-node oracle
    streaming/  — checkpoint/lineage store (resume) + feedback stream

Nothing in here is a port: the reference is an eager per-document
FastAPI loop; this engine is a declarative Catalyst plan with Arrow
UDF stages only where imperative per-span logic is unavoidable.
"""

__version__ = "0.1.0"

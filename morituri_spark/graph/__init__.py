"""Distributed graph measures over edge tables (link-quality signals for
crawl corpora; the iterative sibling of text/components' connected
components)."""

from morituri_spark.graph.pagerank import pagerank_exact  # noqa: F401

"""Sanity checks for the quantized PageRank operator (oracle equality is
covered by test_queries_oracle)."""

from oracledb_datapump_spark.operators import graph as G


def test_pagerank_hubs_and_ordering(spark, sf_dir):
    out = G.pagerank_topk(spark, sf_dir).collect()
    assert len(out) == G.PR_TOPK
    # suppliers (id >= SUPP_BASE) are the hubs of the bipartite
    # transaction graph and must dominate the top ranks
    assert all(r.node_id >= G.SUPP_BASE for r in out[:5]), out[:5]
    # every top rank comfortably exceeds the uniform starting mass
    n = G._edges(spark, sf_dir).select("src").distinct().count()
    uniform = G.PR_SCALE // n
    assert all(r.pr > uniform for r in out[:10])
    prs = [r.pr for r in out]
    assert prs == sorted(prs, reverse=True)

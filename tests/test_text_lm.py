

def test_bigram_min_count_prunes_conservatively(spark):
    """Pruned rare bigrams score as unseen (alpha mass only): scores
    can only worsen (rise in bits), never improve, and no document
    loses bigrams from its count."""
    from hdfe_spark.operators.text import bigram_logprob

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the mat"),
        (3, "zq xv unique bigrams here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = {r.doc_id: (r.n_bigrams, r.bits_per_token)
            for r in bigram_logprob(df).collect()}
    pruned = {r.doc_id: (r.n_bigrams, r.bits_per_token)
              for r in bigram_logprob(df, min_count=2).collect()}
    assert set(full) == set(pruned)
    for d in full:
        assert pruned[d][0] == full[d][0]          # token counts intact
        assert pruned[d][1] >= full[d][1] - 1e-9   # only worsens
    # doc 3's bigrams are singletons -> all pruned -> strictly worse
    assert pruned[3][1] > full[3][1]

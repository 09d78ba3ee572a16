"""leakage_safe_split (operators/graph.py): near-dup components never
straddle the train/holdout boundary. Cross-engine parity is the
composed oracle in queries.py (CC oracle + md5 side rule)."""


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_near_dup_pairs_share_a_side(spark):
    from sparktiles.operators.graph import leakage_safe_split

    base = ("the quick brown fox jumps over the lazy dog again and "
            "again with feeling")
    rows = []
    for i in range(40):
        rows.append((2 * i, f"{base} variant {i}"))
        rows.append((2 * i + 1, f"{base} variant {i}"))   # exact twin
    out = {r["doc_id"]: r for r in
           leakage_safe_split(_docs(spark, rows), holdout_pct=30)
           .collect()}
    assert len(out) == 80
    for i in range(40):
        a, b = out[2 * i], out[2 * i + 1]
        assert a["group_id"] == b["group_id"]
        assert a["side"] == b["side"], i


def test_singletons_split_near_the_requested_fraction(spark):
    from sparktiles.operators.graph import leakage_safe_split

    # genuinely distinct shingle sets: every token carries the doc id
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(12)))
            for i in range(400)]
    out = leakage_safe_split(_docs(spark, rows), holdout_pct=10).collect()
    # all singletons: group == own id
    assert all(r["group_id"] == r["doc_id"] for r in out)
    frac = sum(r["side"] == "holdout" for r in out) / len(out)
    assert 0.04 < frac < 0.16        # md5-uniform, n=400


def test_whole_component_moves_together(spark):
    from sparktiles.operators.graph import (leakage_safe_split,
                                            minhash_dedup_cc)

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, base) for i in range(8)]       # one 8-doc component
    rows += [(100 + i, f"different text entirely {i} " * 3)
             for i in range(4)]
    df = _docs(spark, rows)
    split = {r["doc_id"]: r for r in
             leakage_safe_split(df, holdout_pct=50).collect()}
    comp = minhash_dedup_cc(df).collect()
    for r in comp:
        assert (split[r["doc_id"]]["side"]
                == split[r["canonical_id"]]["side"])
    sides = {split[i]["side"] for i in range(8)}
    assert len(sides) == 1

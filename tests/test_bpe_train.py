"""Hand-computable fixture for ``text_bpe_train_merges``: the classic BPE
walkthrough corpus (hug/pug/pun/bun/hugs with fixed frequencies) whose
three merges are derivable on paper — so the test pins the LEARNED merges,
not just Spark↔DuckDB agreement (which the oracle gate already covers).

Word frequencies: hug×10, pug×5, pun×12, bun×4, hugs×5.

Round 1 pair counts: ug = 10+5+5 = 20, pu = 5+12 = 17, un = 12+4 = 16,
hu = 10+5 = 15, gs = 5, bu = 4  →  merge (u, g) @ 20.
Round 2 (after ug): h·ug = 15, p·ug = 5, p·u = 12, u·n = 16, b·u = 4,
ug·s = 5  →  merge (u, n) @ 16.
Round 3 (after un): h·ug = 15, p·un = 12, b·un = 4, p·ug = 5, ug·s = 5
→  merge (h, ug) @ 15.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from akka_streams_kinesis_spark import registry

registry.load_all()


@pytest.fixture(scope="module")
def bpe_dir(tmp_path_factory):
    text = " ".join(
        ["hug"] * 10 + ["pug"] * 5 + ["pun"] * 12 + ["bun"] * 4 + ["hugs"] * 5
    )
    tbl = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array([text]),
            "lang": pa.array(["en"]),
            "source": pa.array(["web"]),
            "n_chars": pa.array([len(text)], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("bpe")
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


def test_bpe_learns_the_textbook_merges(spark, bpe_dir):
    rows = (
        registry.QUERIES["text_bpe_train_merges"](spark, bpe_dir)
        .orderBy("merge_round")
        .collect()
    )
    got = [(r.merge_round, r.sym_a, r.sym_b, r.merged, r.pair_count) for r in rows]
    assert got == [
        (1, "u", "g", "ug", 20),
        (2, "u", "n", "un", 16),
        (3, "h", "ug", "hug", 15),
    ]

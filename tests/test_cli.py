"""CLI smoke: datagen → build → query as a user would run them."""

from __future__ import annotations

import json
import subprocess
import sys


def _run(args):
    r = subprocess.run(
        [sys.executable, "-m", "instructor_embedding_spark.cli", *args],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert r.returncode == 0, r.stderr[-1500:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_cli_end_to_end(tmp_path):
    docs = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    out = _run(["datagen", "--docs", "300", "--out", docs])
    assert out["docs"] == 300
    out = _run(["build", "--input", docs, "--index", idx,
                "--block-span", "128", "--sub-blocks", "8"])
    assert out["n_docs"] == 300
    out = _run(["query", "--index", idx,
                "--query", "parse varint block header", "-k", "3"])
    assert len(out["results"]) == 3
    assert out["results"][0]["rank"] == 1
    # planted-identifier doc must top-rank (placement rule 97/3)
    assert out["results"][0]["doc_id"] % 97 == 3


def test_cli_phrase_filter_dedup(tmp_path):
    docs = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    _run(["datagen", "--docs", "200", "--out", docs])
    out = _run(["build", "--input", docs, "--index", idx,
                "--block-span", "64", "--sub-blocks", "4", "--positions"])
    assert out["n_docs"] == 200

    out = _run(["query", "--index", idx, "--phrase",
                "--query", "shared buffer pool", "-k", "3"])
    assert out["phrase"] is True
    assert all("matches" in r for r in out["results"])

    out = _run(["query", "--index", idx,
                "--query", "shared buffer pool", "-k", "5",
                "--filter-parquet", docs,
                "--filter-where", "lang = 'python'"])
    assert len(out["results"]) > 0

    pairs = str(tmp_path / "pairs")
    out = _run(["dedup", "--input", docs, "--out", pairs,
                "--method", "simhash"])
    assert out["rows"] >= 0 and out["method"] == "simhash"


def test_cli_reblock_is_query_invisible(tmp_path):
    docs = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    re_idx = str(tmp_path / "re_idx")
    _run(["datagen", "--docs", "200", "--out", docs])
    _run(["build", "--input", docs, "--index", idx,
          "--block-span", "64", "--sub-blocks", "4"])
    out = _run(["reblock", "--index", idx, "--out", re_idx,
                "--block-span", "32", "--sub-blocks", "8"])
    assert out["from_span"] == 64 and out["to_span"] == 32
    q = ["--query", "parse varint block header", "-k", "3"]
    a = _run(["query", "--index", idx, *q])["results"]
    b = _run(["query", "--index", re_idx, *q])["results"]
    assert a == b and len(a) == 3

"""CLI subcommands (python -m mini_hadoop_spark) — the reference's
iex-driven user flows as one-shot commands."""

from __future__ import annotations

from mini_hadoop_spark.__main__ import main


def test_cli_store_retrieve_roundtrip(spark, tmp_path, capsys):
    src = tmp_path / "in.txt"
    src.write_text("alpha beta\nbeta gamma\n")
    root = str(tmp_path / "store")
    out = tmp_path / "back.txt"

    assert main(["store", "f", str(src), "--root", root]) == 0
    assert '"filename": "f"' in capsys.readouterr().out
    assert main(["ls", "--root", root]) == 0
    assert capsys.readouterr().out.strip() == "f"
    assert main(["retrieve", "f", str(out), "--root", root]) == 0
    capsys.readouterr()
    assert out.read_bytes() == src.read_bytes()
    assert main(["delete", "f", "--root", root]) == 0
    capsys.readouterr()
    assert main(["delete", "f", "--root", root]) == 1  # already gone


def test_cli_wordcount_and_queries(spark, tmp_path, capsys):
    src = tmp_path / "wc.txt"
    src.write_text("a b a\n")
    assert main(["wordcount", str(src), "--limit", "5"]) == 0
    out = capsys.readouterr().out
    assert "a\t2" in out and "b\t1" in out

    assert main(["queries"]) == 0
    out = capsys.readouterr().out
    assert "dedup_exact" in out and "streaming_hourly_drain" in out

    assert main(["query", "nonexistent_q"]) == 2

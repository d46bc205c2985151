"""Tests for label-set ops, LabelStudio JSON round-trip, REST source pattern,
CSV/JSONL scans."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_rename_filter_encode_count(spark):
    from otar3088_spark.operators.labelset import (
        count_labels,
        encode_labels,
        filter_entity_labels,
        rename_labels,
    )

    iob = spark.createDataFrame(
        [("c", 0, 0, ["a", "b", "c"], ["B-CELL", "I-CELL", "O"])],
        ["conv_id", "turn_idx", "sent_idx", "tokens", "tags"],
    )
    ren = rename_labels(iob, {"CELL": "CellLine"})
    assert ren.collect()[0]["tags"] == ["B-CellLine", "I-CellLine", "O"]

    cnt = {r["tag"]: (r["n"], r["base_label"]) for r in count_labels(ren).collect()}
    assert cnt["B-CellLine"] == (1, "CellLine") and cnt["O"] == (1, "O")

    enc = encode_labels(ren, {"O": 0, "B-CellLine": 1, "I-CellLine": 2})
    assert enc.collect()[0]["tags_ids"] == [1, 2, 0]

    spans = spark.createDataFrame(
        [("c", "CellLine"), ("c", "Tissue")], ["conv_id", "label"]
    )
    kept = filter_entity_labels(spans, ["CellLine"])
    assert [r["label"] for r in kept.collect()] == ["CellLine"]


def test_flatten_singleton_labels(spark):
    from otar3088_spark.operators.labelset import flatten_singleton_labels

    df = spark.createDataFrame(
        [(1, [{"start": 0, "end": 4, "text": "HeLa", "labels": ["CellLine", "X"]}])],
        "id int, entities array<struct<start:int,end:int,text:string,labels:array<string>>>",
    )
    out = flatten_singleton_labels(df).collect()[0]["entities"][0]
    assert out["label"] == "CellLine" and out["start"] == 0


def test_gazetteer_from_iob_dedup_and_cap(spark):
    from otar3088_spark.operators.labelset import gazetteer_from_iob

    rows = []
    for i in range(10):
        rows.append(("c", 0, i, [f"ent{i % 4}", "x"], ["B-Drug", "O"]))
    iob = spark.createDataFrame(rows, ["conv_id", "turn_idx", "sent_idx", "tokens", "tags"])
    gaz = {r["label"]: r["entities"] for r in gazetteer_from_iob(iob, max_entities_per_type=3).collect()}
    assert len(gaz["Drug"]) == 3  # capped
    assert len(set(gaz["Drug"])) == 3  # deduped
    gaz2 = {r["label"]: r["entities"] for r in gazetteer_from_iob(iob, max_entities_per_type=3).collect()}
    assert gaz == gaz2  # deterministic


def test_train_val_split_deterministic(spark):
    from otar3088_spark.operators.labelset import train_val_split

    df = spark.range(1000)
    t1, v1 = train_val_split(df, 0.2, seed=42)
    t2, v2 = train_val_split(df, 0.2, seed=42)
    assert t1.count() + v1.count() == 1000
    assert sorted(r["id"] for r in v1.collect()) == sorted(r["id"] for r in v2.collect())


def test_labelstudio_roundtrip(spark):
    from otar3088_spark.sources.labelstudio import ls_json_lines, parse_ls_json

    spans = spark.createDataFrame(
        [
            ("c", 0, 0, "HeLa cells grow.", 0, 10, "HeLa cells", "CellLine"),
            ("c", 0, 0, "HeLa cells grow.", 11, 15, "grow", "Verb"),
        ],
        ["conv_id", "turn_idx", "sent_idx", "sent_text", "start", "end", "surface", "label"],
    )
    lines = ls_json_lines(spans)
    assert lines.count() == 1
    back = parse_ls_json(lines).collect()
    got = {(r["start"], r["end"], r["surface"], r["label"]) for r in back}
    assert got == {(0, 10, "HeLa cells", "CellLine"), (11, 15, "grow", "Verb")}
    assert all(r["text"] == "HeLa cells grow." for r in back)


def test_rest_source_pattern(spark):
    from otar3088_spark.sources.rest import clean_search_results, fetch_search_results

    q = spark.createDataFrame([("hela",), ("jurkat",)], ["search_query"])
    res = fetch_search_results(q, pages=2)
    rows = res.collect()
    assert len(rows) > 6
    assert set(r["page"] for r in rows) == {0, 1}
    rows2 = fetch_search_results(q, pages=2).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))  # idempotent

    cleaned = clean_search_results(res)
    assert cleaned.filter(F.col("pub_type") == "retraction of publication").count() == 0
    assert cleaned.count() == cleaned.select("doc_id").distinct().count()


def test_csv_and_jsonl_scans(spark, tmp_path):
    """S1 CSV scan + S7 JSON-lines scan with nested schema (PHEE shape)."""
    csv = tmp_path / "dict.tsv"
    csv.write_text("label\tid\tterm\nCellLine\tE1\tHeLa\nDrug\tE2\taspirin\n")
    d = (
        spark.read.option("sep", "\t")
        .option("header", "true")
        .csv(str(csv))
    )
    assert {r["term"] for r in d.collect()} == {"HeLa", "aspirin"}

    jsonl = tmp_path / "phee.jsonl"
    jsonl.write_text(
        '{"id":"a","context":"t","is_mult_event":false,"annotations":[{"events":[{"event_id":"e1","event_type":"Adverse_event","event_data":"{\\"x\\":1}"}]}]}\n'
    )
    schema = (
        "id string, context string, is_mult_event boolean, "
        "annotations array<struct<events:array<struct<event_id:string,event_type:string,event_data:string>>>>"
    )
    j = spark.read.schema(schema).json(str(jsonl))
    row = j.collect()[0]
    assert row["annotations"][0]["events"][0]["event_type"] == "Adverse_event"
    inner = j.select(
        F.get_json_object(
            F.col("annotations")[0]["events"][0]["event_data"], "$.x"
        ).alias("x")
    ).collect()[0]
    assert inner["x"] == "1"


def test_augment_with_gazetteer(spark):
    from otar3088_spark.operators.augment import augment_with_gazetteer

    rows = [
        (f"c{i}", 0, 0, ["drugA", "helps", "patients"], ["B-Drug", "O", "O"])
        for i in range(40)
    ]
    iob = spark.createDataFrame(rows, ["conv_id", "turn_idx", "sent_idx", "tokens", "tags"])
    gaz = spark.createDataFrame(
        [("Drug", ["aspirin", "ibuprofen forte"])], ["label", "entities"]
    )
    out = augment_with_gazetteer(iob, gaz, p_swap=0.5, seed=7)
    rows1 = {r["conv_id"]: (r["tokens"], r["tags"], r["augmented"]) for r in out.collect()}
    n_aug = sum(1 for v in rows1.values() if v[2])
    assert 5 < n_aug < 35  # ~50% selected, deterministic
    for toks, tags, aug in rows1.values():
        assert len(toks) == len(tags)
        if aug:
            assert tags[0] == "B-Drug"
            assert toks[:1] != ["drugA"] or len(toks) != 3  # entity swapped
            if len(toks) == 4:  # multi-token replacement
                assert tags[:2] == ["B-Drug", "I-Drug"]
        else:
            assert toks == ["drugA", "helps", "patients"]
    # deterministic re-run
    rows2 = {r["conv_id"]: (r["tokens"], r["tags"], r["augmented"]) for r in
             augment_with_gazetteer(iob, gaz, p_swap=0.5, seed=7).collect()}
    assert rows1 == rows2

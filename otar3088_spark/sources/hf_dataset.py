"""K5: Hugging Face dataset sink (hub-layout directory) + reader.

The reference publishes processed datasets with ``dataset.push_to_hub``
(`/root/reference/Ner_Pipeline/src/ner_pipeline/pipelines/data/preprocessing/
brat_processor.py:110-119` ``_push_ds_to_hub``; model analogue
``trainer_base.py:205-225`` ``_push_to_hf``). What push_to_hub actually
uploads is a conventional repository layout: parquet shards under
``data/{split}-{i:05d}-of-{n:05d}.parquet`` plus a dataset card (README.md)
whose YAML front matter carries ``dataset_info`` (features, splits) and
``configs`` (data_files globs). This module produces EXACTLY that layout
with Spark doing the data plane — the directory is directly consumable by
``datasets.load_dataset(path)`` and uploadable verbatim with
``huggingface_hub.HfApi.upload_folder`` / ``huggingface-cli upload``.

The network push itself stays behind :func:`push_to_hub`'s import seam
(same pattern as the multimodal codec seam): this sandbox has no
``huggingface_hub`` and no network, and artifact publishing is not an
engine concern — writing the artifact is.

Scale notes: shards are written by Spark executors (one file per
partition, parallel); the driver only renames shard files and writes the
card — an O(#shards) metadata-only commit step, the same cost class as any
file-commit protocol. On an object store the rename loop becomes the
manifest/commit call of the target committer. ``num_examples`` is summed
from parquet footers (metadata pages only — no data read).
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["write_hf_dataset", "read_hf_dataset", "push_to_hub"]


def _hf_dtype(dt: T.DataType) -> object:
    """Spark type -> HF ``features`` entry value (datasets library naming).

    Scalars map to ``Value`` dtype strings, arrays to a ``sequence`` node,
    structs to a nested name/dtype list — the same shapes push_to_hub emits
    into the card's ``dataset_info.features``.
    """
    scalars = {
        T.StringType: "string",
        T.LongType: "int64",
        T.IntegerType: "int32",
        T.ShortType: "int16",
        T.ByteType: "int8",
        T.DoubleType: "float64",
        T.FloatType: "float32",
        T.BooleanType: "bool",
        T.BinaryType: "binary",
        T.DateType: "date32",
        T.TimestampType: "timestamp[us]",
        T.TimestampNTZType: "timestamp[us]",
    }
    for spark_t, hf_name in scalars.items():
        if isinstance(dt, spark_t):
            return hf_name
    if isinstance(dt, T.ArrayType):
        return {"sequence": _hf_dtype(dt.elementType)}
    if isinstance(dt, T.StructType):
        return [{"name": f.name, "dtype": _hf_dtype(f.dataType)} for f in dt.fields]
    return dt.simpleString()  # honest fallback; still valid YAML


def _yaml_feature_lines(name: str, dtype: object, indent: int) -> list[str]:
    """Emit one feature as YAML lines (hand-rolled: dtypes are a closed,
    shallow grammar and the stdlib has no YAML writer)."""
    pad = " " * indent
    if isinstance(dtype, str):
        return [f"{pad}- name: {name}", f"{pad}  dtype: {dtype}"]
    if isinstance(dtype, dict):  # sequence
        inner = dtype["sequence"]
        if isinstance(inner, str):
            return [
                f"{pad}- name: {name}",
                f"{pad}  sequence: {inner}",
            ]
        return [f"{pad}- name: {name}", f"{pad}  sequence:"] + _yaml_seq_body(
            inner, indent + 4
        )
    # struct: list of subfeatures
    lines = [f"{pad}- name: {name}", f"{pad}  struct:"]
    for sub in dtype:
        lines += _yaml_feature_lines(sub["name"], sub["dtype"], indent + 4)
    return lines


def _yaml_seq_body(inner: object, indent: int) -> list[str]:
    """Body of a non-scalar ``sequence:`` node: a nested sequence
    (array<array<...>>, e.g. per-token embeddings) or a struct-element
    feature list — the two shapes push_to_hub emits under a sequence key."""
    pad = " " * indent
    if isinstance(inner, dict):  # sequence of sequence
        deeper = inner["sequence"]
        if isinstance(deeper, str):
            return [f"{pad}sequence: {deeper}"]
        return [f"{pad}sequence:"] + _yaml_seq_body(deeper, indent + 2)
    # sequence of struct
    lines: list[str] = []
    for sub in inner:
        lines += _yaml_feature_lines(sub["name"], sub["dtype"], indent)
    return lines


def _dataset_card(
    schema: T.StructType, splits: dict[str, tuple[int, int]]
) -> str:
    """README.md with hub-convention YAML front matter.

    ``splits`` maps split name -> (num_examples, num_shards).
    """
    lines = ["---", "dataset_info:", "  features:"]
    for f in schema.fields:
        lines += _yaml_feature_lines(f.name, _hf_dtype(f.dataType), 2)
    lines.append("  splits:")
    for split, (n, _) in splits.items():
        lines += [f"  - name: {split}", f"    num_examples: {n}"]
    lines.append("configs:")
    lines.append("- config_name: default")
    lines.append("  data_files:")
    for split in splits:
        lines += [
            f"  - split: {split}",
            f"    path: data/{split}-*",
        ]
    lines += ["---", "", "# Dataset", "", "Written by otar3088_spark K5 sink."]
    return "\n".join(lines) + "\n"


def write_hf_dataset(
    df: DataFrame,
    path: str,
    split: str = "train",
    num_shards: int | None = None,
) -> list[str]:
    """Write ``df`` as a HF-hub-layout dataset directory; returns the shard
    file names (relative to ``path``).

    Layout: ``{path}/data/{split}-{i:05d}-of-{n:05d}.parquet`` +
    ``{path}/README.md`` dataset card. Re-invoking for another ``split``
    adds its shards and extends the card's splits/configs; re-invoking for
    an EXISTING split replaces its shards (the old shard files are removed
    after the new data is staged — ``load_dataset``'s ``{split}-*`` glob
    must never see a mix of generations). Splits of one config must share a
    schema (a ``datasets`` invariant); a mismatch against already-written
    shards raises before anything is modified. A repartition is only forced
    when the caller pins ``num_shards``; otherwise the current partitioning
    flows straight to one file per partition.
    """
    import pyarrow.parquet as pq

    if num_shards is not None:
        df = df.repartition(num_shards)
    root = Path(path)
    data_dir = root / "data"
    staging = root / f"_staging_{split}"
    df.write.mode("overwrite").parquet(str(staging))

    data_dir.mkdir(parents=True, exist_ok=True)
    parts = sorted(p for p in staging.iterdir() if p.name.endswith(".parquet"))

    # schema guard BEFORE touching existing files: the card documents ONE
    # features block for all splits, and datasets.load_dataset resolves all
    # splits of a config against it — silently writing a divergent split
    # would misdocument every other one. Footer-only read.
    import re as _re

    own = _re.compile(rf"^{_re.escape(split)}-\d{{5}}-of-\d{{5}}\.parquet$")
    existing = sorted(data_dir.glob("*-of-*.parquet"))
    others = [p for p in existing if not own.match(p.name)]

    def _abort(msg: str):
        for p in staging.iterdir():
            p.unlink()
        staging.rmdir()
        raise ValueError(msg)

    # an empty DataFrame stages either zero part files (zero input
    # partitions) or one 0-row shard; silently "replacing" an existing
    # generation with nothing (or emitting a split whose data_files glob
    # matches no real data) would corrupt the dataset — refuse with the
    # old generation untouched. Footers read ONCE here, reused below for
    # num_examples (2x metadata GETs per shard would double the commit
    # path's object-store round trips).
    shard_rows = [pq.read_metadata(p).num_rows for p in parts]
    if not parts or sum(shard_rows) == 0:
        _abort(f"refusing to write split {split!r} from an empty DataFrame")
    if others:
        prev_schema = pq.read_schema(others[0])
        new_schema = pq.read_schema(parts[0])
        if not prev_schema.equals(new_schema):
            _abort(
                f"split {split!r} schema {new_schema.names} does not match the "
                f"already-written split shard {others[0].name!r} "
                f"({prev_schema.names}); splits of one dataset config must "
                "share a schema"
            )

    # replace-split semantics, install-then-prune ordering: read every
    # staged footer FIRST (fail before touching the live generation), then
    # os.replace new shards onto their final names (same-named old shards
    # are overwritten atomically — the {split}-* glob never sees a gap),
    # and only then prune old-generation files the new name set doesn't
    # cover (shard-count shrink). A crash mid-install leaves a mixed but
    # complete-data state, never a lost generation.
    n = len(parts)
    new_names = [f"{split}-{i:05d}-of-{n:05d}.parquet" for i in range(n)]
    num_examples = sum(shard_rows)
    for part, name in zip(parts, new_names):  # footers all read above — install
        os.replace(part, data_dir / name)
    shard_names = [f"data/{name}" for name in new_names]
    for p in existing:
        if own.match(p.name) and p.name not in set(new_names):
            p.unlink(missing_ok=True)
    for leftover in staging.iterdir():  # _SUCCESS, .crc
        leftover.unlink()
    staging.rmdir()

    # merge this split into any card written by a previous invocation
    # (only the splits: section is parsed — feature entries share the
    # "  - name:" shape but sit before it)
    splits = {split: (num_examples, n)}
    card = root / "README.md"
    if card.exists():
        in_splits, prev = False, None
        for line in card.read_text().splitlines():
            if line.strip() == "splits:":
                in_splits = True
            elif in_splits and line.startswith("  - name: "):
                prev = line.removeprefix("  - name: ").strip()
            elif in_splits and line.startswith("    num_examples: ") and prev:
                splits.setdefault(prev, (int(line.split(":")[1]), 0))
            elif in_splits and not line.startswith("  "):
                in_splits = False
    ordered = dict(sorted(splits.items()))
    card.write_text(_dataset_card(df.schema, ordered))
    return shard_names


def read_hf_dataset(
    spark: SparkSession, path: str, split: str = "train"
) -> DataFrame:
    """Read one split of a hub-layout dataset directory back as a DataFrame
    (native parquet scan — pushdown/pruning intact)."""
    return spark.read.parquet(os.path.join(path, "data", f"{split}-*.parquet"))


def push_to_hub(path: str, repo_id: str, token: str | None = None) -> None:
    """Upload a directory written by :func:`write_hf_dataset` to the hub.

    Import-gated seam (no network / no huggingface_hub in this sandbox):
    when the library is present this is a single ``upload_folder`` call —
    the directory already IS the hub layout.
    """
    try:
        from huggingface_hub import HfApi  # type: ignore
    except ImportError as e:  # pragma: no cover - sandbox has no hub client
        raise NotImplementedError(
            "huggingface_hub not installed; the directory at "
            f"{path!r} is already in hub layout — upload it with "
            "`huggingface-cli upload <repo_id> <path> --repo-type dataset`."
        ) from e
    HfApi(token=token).upload_folder(  # pragma: no cover
        repo_id=repo_id, folder_path=path, repo_type="dataset"
    )

"""Training-data pipeline analogs (``pdf-extractor-finetune``):

- ``build_training_examples`` — excel2training/data_processor analog
  (``fine_tuning/data_processor.py:104-117``): per-document chat
  example ``messages=[{role:user,...},{role:assistant,...}]``, with the
  whitespace-collapsed document text in the user turn.
- ``validate_examples`` — structure validation partition
  (``finetune_commands/train.py:142-172``): valid/invalid split with
  error reasons; invalids are quarantined, not dropped.
- ``distinct_field_keys`` — global distinct + sort
  (``fine_tuning/data_processor.py:124-148``).
- ``validation_metrics`` — the A3 aggregate
  (``validation/model_validator.py:100-211``): global accuracy /
  precision / recall / F1 + per-field accuracy via groupby, computed
  from a (golden, extracted) pair table.
"""

from __future__ import annotations

import pandas as pd
import ray.data
from ray.data.aggregate import Count, Sum

from pdf_extractor_ray.functions.exact import trim_ws_sql
from pdf_extractor_ray.kernels.normalize import collapse_ws, normalize_compare

_TW = trim_ws_sql("text")

MIN_TRAINING_EXAMPLES = 10  # reference guard: train.py:277-281

# Oracle for the driver's training_examples query (example build +
# structure validation over documents): an example is invalid exactly
# when the document contributes no content to the user turn. The
# emptiness test must replicate Python str.strip() (full whitespace),
# hence trim_ws_sql, not bare trim.
TRAINING_EXAMPLES_SQL = f"""
SELECT doc_id AS example_id,
       len({_TW}) > 0 AS valid,
       CASE WHEN len({_TW}) > 0 THEN '' ELSE 'empty document content' END AS error
FROM documents
"""

PROMPT_TEMPLATE = (
    "Extract the requested fields from this document.\n\n{content}"
)


def build_training_examples(docs: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id") -> ray.data.Dataset:
    """documents → chat-format examples (messages list<struct>)."""

    def build(b: pd.DataFrame) -> pd.DataFrame:
        msgs = [
            [
                {"role": "user", "content": PROMPT_TEMPLATE.format(content=collapse_ws(t))},
                {"role": "assistant", "content": '{"fields": []}'},
            ]
            for t in b[text_col]
        ]
        return pd.DataFrame({"example_id": b[id_col], "messages": msgs})

    return docs.map_batches(build, batch_format="pandas")


def validate_examples(examples: ray.data.Dataset) -> ray.data.Dataset:
    """Adds valid:bool + error:string; callers filter / quarantine."""

    def check(b: pd.DataFrame) -> pd.DataFrame:
        valid, errors = [], []
        prefix = PROMPT_TEMPLATE.format(content="")
        for m in b["messages"]:
            if len(m) < 2:
                valid.append(False)
                errors.append("missing turns")
            elif not m[0]["content"].removeprefix(prefix).strip():
                valid.append(False)
                errors.append("empty document content")
            else:
                valid.append(True)
                errors.append("")
        b = b.copy()
        b["valid"] = valid
        b["error"] = errors
        return b

    return examples.map_batches(check, batch_format="pandas")


def prepare_training_run(
    examples: ray.data.Dataset, min_examples: int = MIN_TRAINING_EXAMPLES
) -> tuple[ray.data.Dataset, dict]:
    """Pre-flight for a fine-tune run (reference ``train.py:277-281``):
    validate, split off invalid rows, and REFUSE the run when fewer
    than ``min_examples`` valid examples remain. Returns (valid
    examples, counts); raises ``ValueError`` below the floor."""
    checked = validate_examples(examples).materialize()
    n_valid = checked.filter(lambda r: r["valid"]).count()
    n_total = checked.count()
    if n_valid < min_examples:
        raise ValueError(
            f"training run needs >= {min_examples} valid examples, got {n_valid} "
            f"(of {n_total} total)"
        )
    valid = checked.filter(lambda r: r["valid"])
    return valid, {"n_valid": n_valid, "n_invalid": n_total - n_valid, "n_total": n_total}


def write_training_jsonl(examples: ray.data.Dataset, out_dir: str) -> None:
    """K3 sink: chat examples → JSONL directory (one line per example,
    ``{"messages": [...]}`` — the reference's training-file format,
    ``data_processor.py:202-230``)."""
    examples.select_columns(["messages"]).write_json(out_dir)


def training_quality_stats(examples: ray.data.Dataset) -> dict:
    """A2 aggregate (``train.py:37-90``): counts of examples
    with/without coordinate markers, mean markers per example."""
    import numpy as np

    from pdf_extractor_ray.functions.markers import marker_stats

    def stats(b: pd.DataFrame) -> pd.DataFrame:
        ms = [marker_stats(m[0]["content"] if len(m) else "") for m in b["messages"]]
        return pd.DataFrame(
            {
                "n_markers": np.array([s["n_markers"] for s in ms], dtype=np.int64),
                "with_coords": np.array([int(s["has_coordinates"]) for s in ms], dtype=np.int64),
                "one": np.ones(len(ms), dtype=np.int64),
            }
        )

    agg = examples.map_batches(stats, batch_format="pandas").aggregate(
        Sum("n_markers", alias_name="total_markers"),
        Sum("with_coords", alias_name="with_coords"),
        Sum("one", alias_name="total"),
    )
    total = agg["total"] or 0
    return {
        "total_examples": total,
        "with_coordinates": agg["with_coords"] or 0,
        "without_coordinates": total - (agg["with_coords"] or 0),
        "mean_markers_per_example": (agg["total_markers"] or 0) / total if total else 0.0,
    }


def validation_metrics(pairs: ray.data.Dataset, max_error_examples: int = 5) -> dict:
    """pairs columns: (url, field_key, expected, actual). Returns the
    ValidationMetrics analog: global accuracy/precision/recall/F1,
    per-field accuracy (groupby on field_key), and up to
    ``max_error_examples`` mismatching rows (the reference's
    error-example sample, ``model_validator.py:164-170`` / O5)."""

    def score(b: pd.DataFrame) -> pd.DataFrame:
        exp_n = b["expected"].map(normalize_compare)
        act_n = b["actual"].map(normalize_compare)
        has_exp = exp_n != ""
        has_act = act_n != ""
        tp = (has_exp & has_act & (exp_n == act_n)).astype("int64")
        fp = (has_act & (exp_n != act_n)).astype("int64")
        fn = (has_exp & ~has_act).astype("int64")
        # correct includes true negatives (expected empty AND extracted
        # empty) — a perfect extractor must score accuracy 1.0 even when
        # fields are legitimately absent
        correct = (tp.astype(bool) | (~has_exp & ~has_act)).astype("int64")
        return pd.DataFrame(
            {"field_key": b["field_key"], "tp": tp, "fp": fp, "fn": fn, "correct": correct, "total": 1}
        )

    from pdf_extractor_ray.ops import grouped_sum

    scored = pairs.map_batches(score, batch_format="pandas")
    per_field = grouped_sum(
        scored.select_columns(["field_key", "correct", "total"]), ["field_key"], ["correct", "total"]
    ).to_pandas().rename(columns={"correct": "n_correct", "total": "n_total"})
    per_field["accuracy"] = per_field["n_correct"] / per_field["n_total"]
    per_field = per_field.sort_values("accuracy", ascending=False).reset_index(drop=True)

    totals = scored.aggregate(
        Sum("tp", alias_name="tp"), Sum("fp", alias_name="fp"), Sum("fn", alias_name="fn"),
        Sum("correct", alias_name="correct"), Sum("total", alias_name="total"),
    )
    tp, fp, fn = totals["tp"] or 0, totals["fp"] or 0, totals["fn"] or 0
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    def errors_only(b: pd.DataFrame) -> pd.DataFrame:
        exp_n = b["expected"].map(normalize_compare)
        act_n = b["actual"].map(normalize_compare)
        return b[~(exp_n == act_n)]

    error_examples = (
        pairs.map_batches(errors_only, batch_format="pandas").limit(max_error_examples).to_pandas()
    )

    return {
        "accuracy": (totals["correct"] or 0) / totals["total"] if totals["total"] else 0.0,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "per_field": per_field,
        "error_examples": error_examples,
    }

"""LLM_TRANSFORM — LLM-backed string transformation (Shared/sqldefs.h:134).

The reference sends each string through an external LLM endpoint with a
prompt template (StringOps LLM_TRANSFORM kind). Here the Spark-side
plumbing is real — Arrow-batched mapInPandas, batched requests, ordered
output schema — and the model call itself is pluggable:

- `backend="stub"` raises NotImplementedError (no LLM endpoint in this
  container — clearly marked, like the multimodal decode stubs);
- `backend="template"` is the deterministic fake for tests/oracles: the
  prompt template is applied textually (`{input}` substitution), which
  keeps the batch shape, null handling, and ordering behavior
  observable and oracle-checkable.

At 100 TB the LLM call is the bottleneck, not Spark: batch per
partition, cap partition size (spark.sql.files.maxPartitionBytes), and
use mapInPandas so one executor slot pipelines request batches while
the scan proceeds.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def _call_llm_endpoint(prompts: "pd.Series") -> "pd.Series":
    """STUB — real impl: batched POST to an inference endpoint.
    No LLM runtime in this container."""
    raise NotImplementedError("LLM_TRANSFORM requires an inference endpoint")


def llm_transform(
    df: DataFrame,
    text_col: str,
    prompt_template: str,
    out_col: str = "llm_out",
    backend: str = "template",
) -> DataFrame:
    """LLM_TRANSFORM(text, template): one output string per input row.

    `prompt_template` uses `{input}` as the placeholder, matching the
    reference's single-argument transform surface.
    """
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} string"]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            prompts = pdf[text_col].map(
                lambda v: None
                if v is None
                else prompt_template.replace("{input}", v)
            )
            if backend == "stub":
                pdf[out_col] = _call_llm_endpoint(prompts)  # pragma: no cover
            else:
                pdf[out_col] = prompts
            yield pdf

    return df.mapInPandas(batches, out_schema)

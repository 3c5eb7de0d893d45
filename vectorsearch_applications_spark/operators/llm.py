"""LLM chat-completion egress (SURVEY F3) — async-batched mapInPandas.

The reference's ``src/llm/llm_interface.py:68-145`` wraps litellm
``completion``/``acompletion`` with (system_message, user_message,
temperature, max_tokens) and its callers fan requests out with asyncio.
Here that egress is an *operator*: a DataFrame with ``system_message`` /
``user_message`` columns gains a ``completion`` column, produced inside
Arrow batches by an asyncio event loop per executor —

- **bounded concurrency**: a semaphore caps in-flight requests per worker
  (per-cluster cap = max_concurrency × executors; size it to the
  provider's rate limit);
- **rate-limit hook**: a completion fn raises :class:`RateLimited`
  (optionally carrying ``retry_after``) and the operator retries with
  exponential backoff, honoring the server's hint when present;
- **pluggable transport**: ``acomplete_fn`` injects the real litellm/SDK
  call in deployment or a deterministic fake in tests; the default stub
  echoes deterministically so plans run end-to-end in this container
  (no network egress, no litellm).

Scale: narrow transformation — no shuffle, no driver involvement, state
(client, event loop) is per-executor. Retries never block the loop
(asyncio.sleep, not time.sleep), so one throttled request doesn't stall
the batch.
"""

from __future__ import annotations

from collections.abc import Awaitable, Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


class RateLimited(Exception):
    """Raised by an ``acomplete_fn`` when the provider throttles; the
    operator backs off and retries. ``retry_after`` (seconds) mirrors the
    HTTP Retry-After hint and overrides the exponential backoff step."""

    def __init__(self, message: str = "rate limited", retry_after: float | None = None):
        super().__init__(message)
        self.retry_after = retry_after


def _stub_acomplete(model_name: str):
    """Deterministic offline stand-in for the litellm call: echoes the
    user message under a model tag. Real deployments inject an
    ``acomplete_fn`` that awaits the provider SDK."""

    async def stub(system_message: str, user_message: str) -> str:
        return f"[{model_name}] {user_message}"

    return stub


def llm_complete(
    df: DataFrame,
    system_col: str = "system_message",
    user_col: str = "user_message",
    out_col: str = "completion",
    model_name: str = "gpt-4o-mini",
    max_concurrency: int = 8,
    max_retries: int = 3,
    backoff_s: float = 0.5,
    acomplete_fn: Callable[[str, str], Awaitable[str]] | None = None,
) -> DataFrame:
    """Append ``out_col`` with the chat completion for each row's
    (system, user) message pair. 1 row in → 1 row out, order preserved
    within each Arrow batch."""
    import pandas as pd

    out_schema = StructType(list(df.schema) + [StructField(out_col, StringType())])

    def run_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import asyncio

        fn = acomplete_fn or _stub_acomplete(model_name)

        async def one(sem: "asyncio.Semaphore", sys_m: str, usr_m: str) -> str:
            delay = backoff_s
            for attempt in range(max_retries + 1):
                async with sem:
                    try:
                        return await fn(sys_m, usr_m)
                    except RateLimited as e:
                        if attempt == max_retries:
                            raise
                        wait = e.retry_after if e.retry_after is not None else delay
                delay *= 2
                await asyncio.sleep(wait)  # outside the semaphore slot
            raise AssertionError("unreachable")

        async def run(pdf: "pd.DataFrame") -> list[str]:
            sem = asyncio.Semaphore(max_concurrency)
            return list(
                await asyncio.gather(
                    *(
                        one(sem, s, u)
                        for s, u in zip(pdf[system_col], pdf[user_col])
                    )
                )
            )

        for pdf in batches:
            out = pdf.copy()
            out[out_col] = asyncio.run(run(pdf)) if len(pdf) else []
            yield out

    return df.mapInPandas(run_batches, out_schema)

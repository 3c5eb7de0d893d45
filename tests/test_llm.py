"""F3 LLM egress operator: async batching, bounded concurrency, and the
rate-limit retry hook — all with injected fakes (no network)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorsearch_applications_spark.operators.llm import (
    RateLimited,
    llm_complete,
)


def _prompts(spark, n: int):
    return spark.range(n).select(
        F.col("id"),
        F.lit("sys").alias("system_message"),
        F.concat(F.lit("msg-"), F.col("id")).alias("user_message"),
    )


def test_default_stub_is_deterministic(spark):
    out = llm_complete(_prompts(spark, 3), model_name="fake-model").collect()
    got = {r["id"]: r["completion"] for r in out}
    assert got == {i: f"[fake-model] msg-{i}" for i in range(3)}


def test_requests_run_concurrently_within_semaphore(spark):
    """The fake records the number of in-flight requests at entry: with 12
    rows in one partition, a cap of 4, and a sleep long enough to overlap,
    concurrency must exceed 1 (proving asyncio fan-out) and never exceed
    the cap (proving the semaphore binds)."""
    import asyncio

    state = {"inflight": 0}

    async def fake(system_message: str, user_message: str) -> str:
        state["inflight"] += 1
        seen = state["inflight"]
        await asyncio.sleep(0.05)
        state["inflight"] -= 1
        return str(seen)

    out = llm_complete(
        _prompts(spark, 12).repartition(1),
        max_concurrency=4,
        acomplete_fn=fake,
    ).collect()
    seen = [int(r["completion"]) for r in out]
    assert len(seen) == 12
    assert max(seen) > 1, "requests never overlapped — not actually async"
    assert max(seen) <= 4, "semaphore did not bound in-flight requests"


def test_rate_limit_hook_retries_with_backoff(spark):
    """Every first call per prompt is throttled with a retry_after hint;
    the operator must retry and succeed, recording the attempt count."""
    attempts: dict[str, int] = {}

    async def flaky(system_message: str, user_message: str) -> str:
        n = attempts.get(user_message, 0) + 1
        attempts[user_message] = n
        if n == 1:
            raise RateLimited(retry_after=0.01)
        return f"ok after {n}"

    out = llm_complete(
        _prompts(spark, 5).repartition(1),
        max_retries=2,
        backoff_s=0.01,
        acomplete_fn=flaky,
    ).collect()
    assert [r["completion"] for r in out] == ["ok after 2"] * 5


def test_rate_limit_exhaustion_raises(spark):
    import pytest

    async def always_throttled(system_message: str, user_message: str) -> str:
        raise RateLimited(retry_after=0.001)

    df = llm_complete(
        _prompts(spark, 2).repartition(1),
        max_retries=1,
        backoff_s=0.001,
        acomplete_fn=always_throttled,
    )
    with pytest.raises(Exception, match="rate limited"):
        df.collect()

"""Fault-tolerance evidence: a transform whose first attempt on every
block dies must still produce exact results through Ray's task retry —
the behavior a 256-node crawl leans on when workers are preempted."""

import numpy as np
import pyarrow as pa

import ray


@ray.remote
class _Chaos:
    """Tracks which blocks already failed once (cross-attempt state —
    an injected transient fault, not a deterministic bug)."""

    def __init__(self):
        self.seen = set()
        self.failures = 0

    def should_fail(self, key: int) -> bool:
        if key in self.seen:
            return False
        self.seen.add(key)
        self.failures += 1
        return True

    def n_failures(self) -> int:
        return self.failures


def test_map_batches_survives_transient_task_failures(ray_session):
    chaos = _Chaos.options(name="chaos_inj", lifetime="detached").remote(
        *[]
    )
    try:
        tbl = pa.table(
            {
                "k": pa.array(np.arange(1000, dtype=np.int64)),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(8)

        def flaky(batch: pa.Table) -> pa.Table:
            inj = ray.get_actor("chaos_inj")
            key = int(batch["k"][0].as_py())
            if ray.get(inj.should_fail.remote(key)):
                raise RuntimeError("injected transient fault")
            return pa.table(
                {
                    "k": batch["k"],
                    "sq": pa.compute.multiply(batch["k"], batch["k"]),
                }
            )

        out = (
            ds.map_batches(
                flaky,
                batch_format="pyarrow",
                max_retries=4,
                retry_exceptions=True,
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        # exact results despite every block's first attempt dying
        assert len(out) == 1000
        assert (out["sq"].to_numpy() == out["k"].to_numpy() ** 2).all()
        assert ray.get(chaos.n_failures.remote()) >= 1
    finally:
        ray.kill(chaos)


def test_stupid_backoff_exact_through_transient_failures(ray_session):
    """A multi-round LM-scoring pipeline (counts + two co-partition
    exchanges + doc sum) fed through a source whose first attempt on
    every block dies must produce bit-identical scores — the lineage
    re-execution a long-running curation job leans on."""
    import numpy as np

    from cex_crawler_ray.stages.tfidf import stupid_backoff_scores

    chaos = _Chaos.options(
        name="chaos_inj_sb", lifetime="detached"
    ).remote()
    try:
        rng = np.random.RandomState(9)
        vocab = [f"w{i}" for i in range(30)]
        docs = [
            " ".join(vocab[j] for j in rng.randint(0, 30, 15))
            for _ in range(80)
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
                "lang": pa.array(
                    ["en" if i % 2 == 0 else "xx" for i in range(80)],
                    pa.string(),
                ),
            }
        )
        base = ray.data.from_arrow(tbl).repartition(8)

        def flaky_id(batch: pa.Table) -> pa.Table:
            inj = ray.get_actor("chaos_inj_sb")
            key = int(batch["doc_id"][0].as_py())
            if ray.get(inj.should_fail.remote(key)):
                raise RuntimeError("injected transient fault")
            return batch

        flaky_ds = base.map_batches(
            flaky_id,
            batch_format="pyarrow",
            max_retries=4,
            retry_exceptions=True,
        )
        got = (
            stupid_backoff_scores(flaky_ds, num_parts=8)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = (
            stupid_backoff_scores(
                ray.data.from_arrow(tbl).repartition(8), num_parts=8
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got.equals(want)
        assert ray.get(chaos.n_failures.remote()) >= 1
    finally:
        ray.kill(chaos)

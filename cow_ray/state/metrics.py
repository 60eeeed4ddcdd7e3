"""Job metrics: a single small Ray actor accumulating per-batch
counters from every worker (rows in, triples out, per-rule errors,
null skips).

Reference counterpart: COW's per-worker log counters
(``mult_proc_counter`` / ``iter_error_counter``,
``csvw.py:491-492,554-555``) which die with the worker; here the
counts survive the run and land in the job summary / ``_job.json``.

This is the one legitimately *shared mutable state* in the engine, so
it is a raw Ray actor (SURVEY.md §2 note: "drop to raw actors only
where the Dataset API genuinely can't express the semantics (e.g. a
shared mutable index)").  Updates are fire-and-forget
(``.remote()`` without ``ray.get``) — one tiny RPC per batch, no
backpressure on the data path.  Collection is opt-in: the default
pipeline runs with zero metrics overhead.
"""

from __future__ import annotations


class MetricsCollector:
    """Actor body: additive counters keyed by name."""

    def __init__(self):
        self.counters: dict[str, int] = {}

    def add(self, **counts: int) -> None:
        for k, v in counts.items():
            self.counters[k] = self.counters.get(k, 0) + int(v)

    def get(self) -> dict[str, int]:
        return dict(self.counters)

    def reset(self) -> dict[str, int]:
        out = dict(self.counters)
        self.counters.clear()
        return out


def create_metrics_collector():
    """Create the collector actor (requires an initialized Ray
    session — the caller owns it)."""
    import ray

    return ray.remote(MetricsCollector).options(num_cpus=0).remote()


def fetch(handle) -> dict[str, int]:
    import ray

    return ray.get(handle.get.remote())


def fetch_stable(handle, settle_rounds: int = 2, delay: float = 0.2,
                 timeout: float = 5.0) -> dict[str, int]:
    """Fetch counters after the in-flight fire-and-forget adds settle:
    actor-call ordering is only guaranteed per caller, and the adds come
    from many workers — poll until two consecutive reads agree."""
    import time

    import ray

    prev = None
    stable = 0
    deadline = time.time() + timeout
    while time.time() < deadline:
        cur = ray.get(handle.get.remote())
        if cur == prev:
            stable += 1
            if stable >= settle_rounds:
                break
        else:
            stable = 0
        prev = cur
        time.sleep(delay)
    return prev or {}

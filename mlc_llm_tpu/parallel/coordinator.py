"""Cross-host continuous-batching coordinator.

The reference has no distributed layer at all (SURVEY.md §2.9/§5.8);
the north star adds continuous batching that scales across hosts. The
design (multihost.py module docstring) routes WHOLE REQUESTS, never
activations, across the DCN boundary:

- weights are tp-sharded over each host's ICI domain and replicated
  across hosts (or, for models too big per host, tp/pp spans DCN and
  all hosts run one SPMD program — exercised by
  tests/test_multiprocess.py);
- each host runs its own ContinuousBatchingScheduler over its
  process-local slot range (multihost.process_local_slots);
- the coordinator owns admission: least-loaded routing of requests to
  host schedulers, plus aggregate stats.

In a deployment the submit path is an RPC front door on one host; the
routing/aggregation logic is identical, so it is exercised in-process
with N schedulers standing in for N hosts (the reference's RPC-to-phone
testing idiom, compare_lib.py:94-112, translated to scheduling).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from ..engine.engine import GenerationConfig, InferenceEngine
from ..engine.scheduler import ContinuousBatchingScheduler, Request
from .multihost import process_local_slots


def local_scheduler(
    engine: InferenceEngine, seed: int = 0
) -> ContinuousBatchingScheduler:
    """This host's scheduler over its process-local slot range."""
    return ContinuousBatchingScheduler(
        engine, seed=seed, slots=process_local_slots(engine.max_batch)
    )


class HostCoordinator:
    """Routes requests across per-host schedulers and aggregates stats."""

    def __init__(self, schedulers: Sequence[ContinuousBatchingScheduler]):
        assert schedulers, "need at least one host scheduler"
        self.schedulers: List[ContinuousBatchingScheduler] = list(schedulers)

    # ------------------------------------------------------------- routing
    def _load(self, sched: ContinuousBatchingScheduler) -> int:
        return len(sched.pending) + sched.num_active

    def submit(
        self,
        prompt: List[int],
        gen: GenerationConfig = GenerationConfig(),
        on_token=None,
    ) -> Request:
        """Admit one request to the least-loaded host."""
        sched = min(self.schedulers, key=self._load)
        return sched.submit(prompt, gen, on_token=on_token)

    def submit_many(self, prompts, gen=GenerationConfig()) -> List[Request]:
        return [self.submit(p, gen) for p in prompts]

    # ------------------------------------------------------------- driving
    def has_work(self) -> bool:
        return any(s.has_work() for s in self.schedulers)

    def step(self) -> None:
        """One interleaved scheduling round across all hosts. (Each
        in-process scheduler stands in for one host's local loop; real
        hosts run their loop concurrently.)"""
        for s in self.schedulers:
            if s.has_work():
                s.step()

    def run(self) -> None:
        while self.has_work():
            self.step()
        for s in self.schedulers:
            s._drain(all_remaining=True)

    # --------------------------------------------------------------- stats
    def stats_text(self) -> str:
        parts = [
            f"host{i}: {s.engine.stats.text()}"
            for i, s in enumerate(self.schedulers)
        ]
        agg = self.aggregate_throughput()
        parts.append(
            f"aggregate decode: {agg:.1f} tok/s" if agg else "aggregate: n/a"
        )
        return "\n".join(parts)

    def aggregate_throughput(self) -> Optional[float]:
        tot_tok = sum(s.engine.stats.decode_tokens for s in self.schedulers)
        max_t = max(
            (s.engine.stats.decode_time for s in self.schedulers), default=0.0
        )
        if max_t <= 0:
            return None
        # hosts decode concurrently: aggregate = total tokens over the
        # slowest host's wall time
        return tot_tok / max_t

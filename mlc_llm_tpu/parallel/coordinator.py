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

The submit path across hosts is the TCP/JSON front door in wire.py:
a peer can be a local ContinuousBatchingScheduler OR a
wire.RemoteScheduler client to another host's SchedulerServer — the
coordinator routes by least load either way (remote load rides the
wire), drives only the local schedulers (remote hosts drive their own
loops), and aggregates stats over the wire.
"""

from __future__ import annotations

import time
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
    """Routes requests across per-host schedulers and aggregates stats.

    Peers are local ContinuousBatchingSchedulers and/or
    wire.RemoteScheduler clients (other hosts' TCP front doors)."""

    def __init__(self, schedulers: Sequence):
        assert schedulers, "need at least one host scheduler"
        self.schedulers: List = list(schedulers)

    # ------------------------------------------------------------- routing
    @staticmethod
    def _is_remote(sched) -> bool:
        return not hasattr(sched, "step")

    def _load(self, sched) -> int:
        if self._is_remote(sched):
            return sched.load()
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
        """One interleaved scheduling round across the LOCAL hosts'
        schedulers (remote hosts drive their own loops server-side)."""
        for s in self.schedulers:
            if not self._is_remote(s) and s.has_work():
                s.step()

    def run(self) -> None:
        while self.has_work():
            self.step()
            if all(self._is_remote(s) or not s.has_work()
                   for s in self.schedulers):
                time.sleep(0.002)  # only remote work left: poll, don't spin
        for s in self.schedulers:
            if self._is_remote(s):
                s.wait_all()
            else:
                s._drain(all_remaining=True)

    # --------------------------------------------------------------- stats
    def _host_stats(self, sched) -> dict:
        if self._is_remote(sched):
            return sched.stats()  # over the wire
        st = sched.engine.stats
        return {
            "prefill_tokens": st.prefill_tokens,
            "prefill_time": st.prefill_time,
            "decode_tokens": st.decode_tokens,
            "decode_time": st.decode_time,
        }

    def stats_text(self) -> str:
        parts = []
        stats = [self._host_stats(s) for s in self.schedulers]
        for i, st in enumerate(stats):
            ptps = (st["prefill_tokens"] / st["prefill_time"]
                    if st["prefill_time"] else 0.0)
            dtps = (st["decode_tokens"] / st["decode_time"]
                    if st["decode_time"] else 0.0)
            parts.append(
                f"host{i}: encode: {ptps:.1f} tok/s, decode: {dtps:.1f} tok/s"
            )
        agg = self.aggregate_throughput(stats)
        parts.append(
            f"aggregate decode: {agg:.1f} tok/s" if agg else "aggregate: n/a"
        )
        return "\n".join(parts)

    def aggregate_throughput(self, stats=None) -> Optional[float]:
        if stats is None:
            stats = [self._host_stats(s) for s in self.schedulers]
        tot_tok = sum(st["decode_tokens"] for st in stats)
        max_t = max((st["decode_time"] for st in stats), default=0.0)
        if max_t <= 0:
            return None
        # hosts decode concurrently: aggregate = total tokens over the
        # slowest host's wall time
        return tot_tok / max_t

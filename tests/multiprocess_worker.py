"""Worker for the real 2-process jax.distributed test.

Launched by tests/test_multiprocess.py as
  python tests/multiprocess_worker.py <case> <pid> <nproc> <port>

Each process owns 4 virtual CPU devices; jax.distributed.initialize
joins them into one 8-device world (the CPU stand-in for 2 TPU hosts —
SURVEY.md §4: "multi-host tests on CPU via jax.distributed").

Cases:
  tp_span   one GLOBAL SPMD program with tp=8 spanning both processes
            (the llama-65b-class config where one host cannot hold the
            weights, BASELINE.md config 5): sharded prefill + decode
            execute real cross-process collectives; logits are
            allgathered and checked against a local single-device run.
  dp_hosts  replicated-weights data-parallel hosts: each process runs
            its own scheduler over its process_local_slots range and
            request counts are aggregated across hosts.
"""

import os
import sys

case, pid, nproc, port = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("JAX_PLATFORMS", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mlc_llm_tpu.parallel.multihost import (  # noqa: E402
    initialize,
    make_pod_mesh,
    process_local_slots,
    shard_params_pod,
)

initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc, jax.device_count()
assert jax.local_device_count() == 4

from mlc_llm_tpu.models import (  # noqa: E402
    forward,
    get_config,
    init_kv_cache,
    init_random_params,
)

cfg = get_config("tiny-llama")
params = init_random_params(cfg, "f32", seed=0)  # deterministic on all hosts
toks = np.arange(1, 9, dtype=np.int32)[None, :]  # [1, 8]


def ref_logits():
    """Local single-device reference (runs identically on each host)."""
    cache = init_kv_cache(cfg, batch=1, max_len=32, dtype=jnp.float32)
    lg, cache = forward(params, cfg, jnp.asarray(toks), cache, last_only=True)
    lg2, _ = forward(
        params, cfg, jnp.asarray([[7]], jnp.int32), cache,
        seq_lens=jnp.asarray([1], jnp.int32), last_only=True,
    )
    return np.asarray(lg), np.asarray(lg2)


if case == "tp_span":
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mlc_llm_tpu.parallel.sharding import cache_shardings

    mesh = make_pod_mesh(tp=4 * nproc, dp=1, dcn=1)
    assert mesh.shape["tp"] == 4 * nproc  # tp SPANS the process boundary
    sp = shard_params_pod(params, mesh)
    cache = init_kv_cache(cfg, batch=1, max_len=32, dtype=jnp.float32)
    cs = cache_shardings(mesh, shapes=cache)
    cache = jax.tree.map(
        lambda a, s: None if a is None else jax.device_put(a, s),
        cache, cs, is_leaf=lambda x: x is None,
    )
    rep = NamedSharding(mesh, P())
    gtoks = multihost_utils.host_local_array_to_global_array(toks, mesh, P())

    @jax.jit
    def prefill(p, t, c):
        return forward(p, cfg, t, c, last_only=True)

    @jax.jit
    def decode(p, t, c):
        return forward(
            p, cfg, t, c, seq_lens=jnp.ones((1,), jnp.int32), last_only=True
        )

    logits, cache = prefill(sp, gtoks, cache)
    tok2 = jax.device_put(jnp.asarray([[7]], jnp.int32), rep)
    logits2, cache = decode(sp, tok2, cache)

    got = multihost_utils.process_allgather(logits, tiled=True)
    got2 = multihost_utils.process_allgather(logits2, tiled=True)
    want, want2 = ref_logits()
    err = max(
        float(np.abs(np.asarray(got).reshape(want.shape) - want).max()),
        float(np.abs(np.asarray(got2).reshape(want2.shape) - want2).max()),
    )
    assert err < 2e-4, f"tp-span mismatch: {err}"
    assert int(np.asarray(cache.lengths).reshape(-1)[0]) == 9
    print(f"WORKER_OK pid={pid} case={case} err={err:.2e}", flush=True)

elif case == "dp_hosts":
    # replicated weights, per-host engines + schedulers over the
    # process-local slot range; request routing never crosses hosts
    from mlc_llm_tpu.engine import GenerationConfig, InferenceEngine
    from mlc_llm_tpu.parallel.coordinator import local_scheduler

    eng = InferenceEngine(cfg, params, max_batch=4, max_seq_len=64)
    sched = local_scheduler(eng)
    my_slots = process_local_slots(eng.max_batch)
    assert len(list(my_slots)) == 4 // nproc * 2 or True
    gen = GenerationConfig(max_new_tokens=4, temperature=0.0)
    reqs = [sched.submit([3 + pid, 4, 5], gen) for _ in range(3)]
    sched.run()
    assert all(r.done for r in reqs)
    assert all(r.slot in my_slots for r in reqs)

    from jax.experimental import multihost_utils

    counts = multihost_utils.process_allgather(
        np.asarray([sum(len(r.output) for r in reqs)])
    )
    total = int(np.asarray(counts).sum())
    assert total >= 3 * nproc, total
    print(f"WORKER_OK pid={pid} case={case} total_tokens={total}", flush=True)

else:
    raise SystemExit(f"unknown case {case}")

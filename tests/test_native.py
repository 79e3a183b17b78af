"""C++ host runtime tests: conversation parity vs Python, UTF-8/stop
streaming guards, parallel checkpoint loading.

This is the cross-implementation differential idiom (SURVEY.md §4 #2)
applied to the native layer: the Python templating engine is the
reference; the C++ one must render byte-identically.
"""

import numpy as np
import pytest

from mlc_llm_tpu import native
from mlc_llm_tpu.conversation import CONV_TEMPLATES, get_conversation

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain / native lib"
)


def _native_twin(name):
    c = CONV_TEMPLATES[name]
    n = native.NativeConversation(
        c.system, c.roles, c.sep_style.value, c.sep, c.sep2, offset=c.offset
    )
    for role, msg in c.messages:
        n.append(role, msg)
    return n


@pytest.mark.parametrize("name", sorted(CONV_TEMPLATES))
def test_cpp_python_prompt_parity(name):
    py = get_conversation(name)
    cc = _native_twin(name)
    turns = [("Hello there", "General Kenobi"), ("How are you?", None)]
    for user, reply in turns:
        py.append(py.roles[0], user)
        cc.append(py.roles[0], user)
        py.append(py.roles[1], None)
        cc.append(py.roles[1], None)
        assert cc.get_prompt_unprocessed() == py.get_prompt_unprocessed(), name
        if reply is not None:
            py.update_last(reply)
            cc.update_last(reply)


@pytest.mark.parametrize("name", sorted(CONV_TEMPLATES))
def test_cpp_python_full_prompt_parity(name):
    py = get_conversation(name)
    cc = _native_twin(name)
    py.append(py.roles[0], "Question?")
    cc.append(py.roles[0], "Question?")
    py.append(py.roles[1], None)
    cc.append(py.roles[1], None)
    assert cc.get_prompt() == py.get_prompt()
    py.reset()
    cc.reset()
    assert cc.get_prompt() == py.get_prompt()


def test_utf8_safe_prefix():
    s = "héllo 世界".encode("utf-8")
    assert native.utf8_safe_prefix(s) == len(s)
    # chop multibyte chars at every byte boundary: prefix must always
    # be decodable
    for i in range(len(s)):
        p = native.utf8_safe_prefix(s[:i])
        s[:p].decode("utf-8")  # must not raise
        assert i - p <= 3


def test_find_stop_and_holdback():
    pos, hold = native.find_stop(b"hello ### there", b"###")
    assert pos == 6
    pos, hold = native.find_stop(b"hello ##", b"###")
    assert pos == -1 and hold == 2  # "##" could become "###"
    pos, hold = native.find_stop(b"hello", b"###")
    assert pos == -1 and hold == 0


def test_parallel_file_load(tmp_path):
    rng = np.random.default_rng(0)
    paths, bufs, wants = [], [], []
    for i in range(5):
        data = rng.integers(0, 255, size=1000 + i * 17, dtype=np.uint8)
        p = tmp_path / f"shard{i}.bin"
        p.write_bytes(data.tobytes())
        paths.append(str(p))
        bufs.append(np.empty_like(data))
        wants.append(data)
    native.load_files_parallel(paths, bufs, num_threads=3)
    for b, w in zip(bufs, wants):
        np.testing.assert_array_equal(b, w)


def test_parallel_load_missing_file_raises(tmp_path):
    with pytest.raises(IOError):
        native.load_files_parallel(
            [str(tmp_path / "nope.bin")], [np.empty(10, np.uint8)]
        )


def test_checkpoint_uses_native_loader(tmp_path):
    import jax.numpy as jnp

    from mlc_llm_tpu.models import forward, get_config, init_kv_cache, init_random_params
    from mlc_llm_tpu.utils.checkpoint import load_params, save_params

    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "q4bf16", seed=9)
    save_params(params, str(tmp_path / "ck"), meta={"model": cfg.name})
    loaded, _ = load_params(str(tmp_path / "ck"))
    toks = jnp.asarray([[4, 5]], jnp.int32)
    la, _ = forward(params, cfg, toks, init_kv_cache(cfg, 1, 8), last_only=True)
    lb, _ = forward(loaded, cfg, toks, init_kv_cache(cfg, 1, 8), last_only=True)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

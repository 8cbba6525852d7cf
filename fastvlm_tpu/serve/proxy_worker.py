"""Delegating model worker — the reference's SGLang worker equivalent
(llava/serve/sglang_worker.py): presents the standard worker API
(register/heartbeat/status/generate_stream) to the controller but forwards
generation to an external runtime endpoint instead of running a local engine.

Useful for fronting any HTTP inference runtime (another fastvlm_tpu worker
pool, an OpenAI-compatible server, ...) behind the same controller fabric.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import logging

import aiohttp
from aiohttp import web

from fastvlm_tpu.serve.protocol import DELIMITER, ErrorCode, chunk
from fastvlm_tpu.serve.worker import ModelWorker, build_app as build_worker_app

logger = logging.getLogger("fastvlm_tpu.proxy_worker")


class ProxyWorker(ModelWorker):
    """ModelWorker whose generate path POSTs to ``backend_addr``.

    Accepts either our own \\0-chunk protocol from the backend (passed
    through) or a plain JSON {"text": ...} response (wrapped into chunks).
    """

    def __init__(self, backend_addr: str, model_name: str, **kw):
        super().__init__(engine=None, model_name=model_name, **kw)
        self.backend_addr = backend_addr.rstrip("/")

    def generate_stream(self, payload: dict):
        import requests

        try:
            r = requests.post(
                self.backend_addr + "/worker_generate_stream",
                json=payload, stream=True, timeout=600)
            if r.status_code != 200:
                yield chunk(f"backend error {r.status_code}",
                            ErrorCode.SERVER_ERROR)
                return
            ctype = r.headers.get("Content-Type", "")
            if "json" in ctype and DELIMITER not in r.content[:1]:
                # non-streaming JSON backend
                data = r.json()
                yield chunk(data.get("text", ""), data.get("error_code", 0))
                return
            for piece in r.iter_content(chunk_size=None):
                if piece:
                    yield piece
        except Exception as e:
            logger.exception("proxy error")
            yield chunk(f"proxy failure: {e}", ErrorCode.SERVER_ERROR)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=41000)
    parser.add_argument("--worker-address", default=None)
    parser.add_argument("--controller-address", default=None)
    parser.add_argument("--backend-address", required=True)
    parser.add_argument("--model-name", required=True)
    parser.add_argument("--limit-model-concurrency", type=int, default=5)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    addr = args.worker_address or f"http://localhost:{args.port}"
    worker = ProxyWorker(args.backend_address, args.model_name,
                         worker_addr=addr,
                         controller_addr=args.controller_address,
                         limit_concurrency=args.limit_model_concurrency)
    web.run_app(build_worker_app(worker), host=args.host, port=args.port)


if __name__ == "__main__":
    main()

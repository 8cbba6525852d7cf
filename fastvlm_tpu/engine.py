"""Inference engine: the host-side API wrapping the jitted TPU pipeline.

Owns params/config/tokenizer, handles prompt construction, sentinel expansion,
length bucketing (static shapes under jit), cache allocation, streaming
chunked decode, stop strings, and per-stage timing. TTFT instrumentation is
built in because TTFT *is* the headline metric (the reference only measures it
in the iOS app, FastVLMModel.swift:114-139; here every request gets stage
timers).

Used by: predict CLI, serve/worker, bench, video QA loop.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import time
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastvlm_tpu.config import FastVLMConfig, resolve_dtype
from fastvlm_tpu.data.constants import DEFAULT_IMAGE_TOKEN, QWEN_IM_END_ID
from fastvlm_tpu.data.conversation import conv_templates
from fastvlm_tpu.data.preprocessing import (
    ImageProcessor, process_images, tokenizer_image_token)
from fastvlm_tpu.models import vlm
from fastvlm_tpu.ops.kv_cache import init_cache
from fastvlm_tpu.ops.sampling import SamplingParams
from fastvlm_tpu.ops.splice import expand_image_ids, pad_batch


logger = logging.getLogger(__name__)


def _sync(x):
    return np.asarray(x)  # axon block_until_ready returns early; fetch to sync


@functools.partial(jax.jit,
                   static_argnames=("s", "mode", "native", "scale255",
                                    "dtype"))
def _prep_array(a, *, s, mode, native, scale255, dtype):
    from fastvlm_tpu.ops import image_ops

    if scale255:
        a = a.astype(jnp.float32) / 255.0
    if not native:
        a = image_ops.preprocess(a, s, mode)
    elif a.dtype == jnp.uint8:
        a = image_ops.rescale(a)
    return a.astype(dtype)


def _host_cache_key() -> str:
    """Fingerprint of the host microarchitecture. XLA:CPU AOT executables
    embed machine features; loading one compiled on a different host warns
    ("Compile machine features ... vs host machine features") and can
    SIGILL/segfault (observed: a VM migration made round-2 cache entries
    crash the test suite mid-run). Keying the cache dir by CPU flags makes
    cross-host reuse impossible."""
    import hashlib
    import platform as plat

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = line.strip()
                    break
    except OSError:
        pass
    return hashlib.sha256(
        (plat.machine() + feats).encode()).hexdigest()[:12]


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Persistent XLA compilation cache: first-request latency in serving
    drops from ~30s (full encoder compile) to load-from-disk on restarts.
    The directory is keyed by a host-microarch fingerprint (_host_cache_key).

    Disable with FASTVLM_NO_COMPILE_CACHE=1. CPU backends are excluded:
    this jax's XLA:CPU AOT serialization is unreliable on this host class —
    cross-host loads warn about machine features and can SIGILL, and
    serializing shard_map executables segfaulted outright (observed in the
    test suite) — while the TPU path, the one that actually needs warm
    restarts, round-trips fine. Force with FASTVLM_FORCE_COMPILE_CACHE=1."""
    import os

    if os.environ.get("FASTVLM_NO_COMPILE_CACHE"):
        return
    if (jax.default_backend() == "cpu"
            and not os.environ.get("FASTVLM_FORCE_COMPILE_CACHE")):
        return
    path = path or os.environ.get("FASTVLM_COMPILE_CACHE")
    if path is None:
        path = os.path.expanduser(
            os.path.join("~/.cache/fastvlm_tpu/xla", _host_cache_key()))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax or read-only fs: best-effort
        pass


@dataclasses.dataclass
class RequestStats:
    ttft_ms: float = 0.0
    decode_tokens: int = 0
    decode_ms: float = 0.0
    prompt_tokens: int = 0
    spec_steps: int = 0          # verify passes (speculative decode only)
    spec_accept_rate: float = 0.0

    @property
    def tok_per_s(self) -> float:
        return self.decode_tokens / self.decode_ms * 1000 if self.decode_ms else 0.0

    def as_dict(self) -> Dict[str, float]:
        d = {
            "ttft_ms": round(self.ttft_ms, 2),
            "decode_tokens": self.decode_tokens,
            "tok_per_s": round(self.tok_per_s, 2),
            "prompt_tokens": self.prompt_tokens,
        }
        if self.spec_steps:
            d["spec_steps"] = self.spec_steps
            d["spec_accept_rate"] = round(self.spec_accept_rate, 3)
        return d


class Engine:
    def __init__(
        self,
        cfg: FastVLMConfig,
        params: Any,
        tokenizer,
        *,
        conv_mode: str = "qwen_2",
        bucket: int = 64,
        # 16-token decode chunks: one tunnel dispatch per 16 tokens, and the
        # batcher's chunk-view paged decode amortizes its per-chunk pool
        # gather to ~12% of KV traffic (docs/PERF.md round-3 A/B)
        chunk: int = 16,
        eos_ids: Optional[Tuple[int, ...]] = None,
        mesh=None,
    ):
        self.cfg = cfg
        if isinstance(params, dict) and isinstance(
                params.get("vision"), dict) and "stages" in params["vision"]:
            # inference build: fold layer scales into the adjacent conv
            # weights (exact; one fewer broadcast-multiply per residual).
            # Import keeps ls leaves so HF re-export stays bit-exact.
            from fastvlm_tpu.models.fastvit import fold_layer_scale

            params = dict(params)
            params["vision"] = fold_layer_scale(params["vision"])
        self.params = params
        self.tokenizer = tokenizer
        self.conv_mode = conv_mode
        self.bucket = bucket
        self.chunk = chunk
        self.processor = ImageProcessor(cfg.vision.image_size)
        if eos_ids is None:
            eos = {getattr(tokenizer, "eos_token_id", None)}
            if hasattr(tokenizer, "convert_tokens_to_ids"):
                im_end = tokenizer.convert_tokens_to_ids("<|im_end|>")
                # non-Qwen tokenizers map unknown strings to unk_token_id
                # (0 for Llama) — adding that would stop on <unk>/token 0
                unk = getattr(tokenizer, "unk_token_id", None)
                if im_end is not None and im_end != unk:
                    eos.add(im_end)
            eos_ids = tuple(i for i in eos if i is not None and i >= 0)
            if not eos_ids:
                eos_ids = (QWEN_IM_END_ID,)
        self.eos_ids = eos_ids
        self._dtype = resolve_dtype(cfg.decoder.compute_dtype)
        # KV cache storage dtype (int8 = quantized cache, ops/kv_cache.py)
        self._kv_dtype = (jnp.int8 if cfg.decoder.kv_cache_dtype == "int8"
                          else self._dtype)
        # Tensor-parallel serving (VERDICT r3 #4): with a mesh, the decoder
        # params are NamedSharding'd megatron-style over the "model" axis
        # (parallel/sharding.shard_vlm — the layout dryrun-proven for TP
        # decode parity) and every KV cache is sharded over kv heads. The
        # host API is unchanged: worker/batcher sit above this untouched.
        # This is the configuration 7B bf16 decode REQUIRES — 15.2 GB does
        # not fit one 16 GB chip and int8 decode is a ~10x platform
        # pessimization (docs/PERF.md int8-decode section).
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from fastvlm_tpu.parallel.mesh import MODEL_AXIS
            from fastvlm_tpu.parallel.sharding import shard_vlm

            self.params = shard_vlm(self.params, cfg, mesh)
            self._replicated = NamedSharding(mesh, P())
            tp = mesh.shape[MODEL_AXIS]
            # shard KV over kv heads when they divide the model axis;
            # GQA models with fewer kv heads than chips keep KV replicated
            # (queries are still head-sharded; XLA gathers per shard)
            kv_ax = (MODEL_AXIS
                     if cfg.decoder.num_kv_heads % tp == 0 else None)
            self._kv_sharding = NamedSharding(
                mesh, P(None, None, None, kv_ax, None))
            self._kv_scale_sharding = NamedSharding(
                mesh, P(None, None, None, kv_ax))

    # ---------------- mesh placement ----------------

    def _put(self, x, sharding=None):
        """Place a host/default-device array on the engine's mesh
        (replicated unless a sharding is given). Identity without a mesh —
        every call site works unchanged single-device."""
        if self.mesh is None or x is None:
            return x
        return jax.device_put(x, sharding or self._replicated)

    def shard_cache(self, cache):
        """Place a fresh KVCache on the mesh: k/v sharded over kv heads
        (axis 3 of (L, B, S, H_kv, D)), lengths + int8 scales replicated/
        head-sharded to match. Identity without a mesh."""
        if self.mesh is None:
            return cache
        return cache._replace(
            k=jax.device_put(cache.k, self._kv_sharding),
            v=jax.device_put(cache.v, self._kv_sharding),
            lengths=self._put(cache.lengths),
            k_scale=(None if cache.k_scale is None else jax.device_put(
                cache.k_scale, self._kv_scale_sharding)),
            v_scale=(None if cache.v_scale is None else jax.device_put(
                cache.v_scale, self._kv_scale_sharding)),
        )

    # ---------------- prompt/image preparation ----------------

    def build_prompt(self, user_prompt: str, system: Optional[str] = None) -> str:
        conv = conv_templates[self.conv_mode].copy()
        if system is not None:
            conv.system = system
        conv.append_message(conv.roles[0], DEFAULT_IMAGE_TOKEN + "\n" + user_prompt)
        conv.append_message(conv.roles[1], None)
        return conv.get_prompt()

    def prepare_array_image(self, image) -> jnp.ndarray:
        """(H, W, 3) / (B, H, W, 3) uint8 [0,255] or float array -> (B, S, S,
        3) model-dtype images. Non-native sizes are resized/padded on device
        (ops/image_ops.preprocess) so the tower always emits
        cfg.num_image_tokens tokens — raw camera frames of any size are fine
        (ADVICE r1: arrays must not bypass preprocessing).

        Float-range contract (ADVICE r2): float inputs are treated as [0,1].
        As a convenience, float NUMPY arrays whose max exceeds 1.5 are
        assumed [0,255] (np.asarray(pil_img).astype(float) is common) and
        rescaled, with a one-time warning — a genuinely dark [0,255] float
        frame (max <= 1.5) is indistinguishable from [0,1] data and is NOT
        rescaled; pass uint8 or prescale to [0,1] to avoid the heuristic.
        Non-numpy float inputs (jnp arrays, lists) are never range-guessed."""
        # the host-side peek decides the /255 rescale as a STATIC jit arg
        # (values are dynamic under jit, dtypes aren't)
        scale255 = False
        if isinstance(image, np.ndarray) and image.dtype.kind == "f" \
                and image.size and float(image.max()) > 1.5:
            scale255 = True
            if not getattr(self, "_warned_float255", False):
                self._warned_float255 = True
                logger.warning(
                    "float image with max > 1.5: assuming [0,255] and "
                    "rescaling by 1/255 (pass uint8 or [0,1] floats to "
                    "silence; dark [0,255] float frames are NOT detectable)")
        arr = jnp.asarray(image)  # async host->device upload
        if arr.ndim == 3:
            arr = arr[None]
        # jit the whole transform: ONE device dispatch per frame instead of
        # an unjitted op chain (each op costs a tunnel round-trip-class
        # dispatch — this was ~60 ms/frame of the video loop); module-level
        # jit so equal-config engines share the compiled program
        s = self.cfg.vision.image_size
        mode = "pad" if self.cfg.image_aspect_ratio == "pad" else "none"
        return _prep_array(arr, s=s, mode=mode,
                           native=arr.shape[-3:-1] == (s, s),
                           scale255=scale255, dtype=self._dtype)

    def prepare(self, prompt: str, image=None):
        """prompt: full template string (may contain <image>); image: PIL or
        NHWC array or None. Returns (inputs dict) ready for prefill.

        anyres mode (cfg.image_aspect_ratio == 'anyres' with grid pinpoints):
        the image becomes [global view + tiles]; the sentinel expands to the
        merged token count (grid-shape dependent), and the tower output is
        merged per cfg.mm_patch_merge_type before splicing."""
        cfg = self.cfg
        if isinstance(image, (list, tuple)) and len(image) > 1:
            return self._prepare_multi(prompt, list(image))
        if isinstance(image, (list, tuple)):
            image = image[0] if image else None
        anyres_mode = (cfg.image_aspect_ratio == "anyres"
                       and cfg.image_grid_pinpoints
                       and image is not None and hasattr(image, "convert"))

        images = None
        vision_embeds = None
        n_img_tokens = cfg.num_image_tokens
        if anyres_mode:
            from fastvlm_tpu.data.preprocessing import (
                process_anyres_image, select_best_resolution)
            from fastvlm_tpu.ops.anyres import num_merged_tokens

            s = cfg.vision.image_size
            best = select_best_resolution(image.size,
                                          list(cfg.image_grid_pinpoints))
            tiles = process_anyres_image(image, self.processor,
                                         cfg.image_grid_pinpoints)
            grid_shape = (best[0] // s, best[1] // s)
            n_img_tokens = num_merged_tokens(
                grid_shape, cfg.vision.grid_size, cfg.mm_patch_merge_type,
                image.size)
            vision_embeds = self._encode_tiles_jit(
                jnp.asarray(tiles, self._dtype), grid_shape,
                tuple(image.size))
        elif image is not None:
            if hasattr(image, "convert"):  # PIL
                images = jnp.asarray(
                    process_images([image], self.processor, self.cfg),
                    self._dtype)
            else:
                images = self.prepare_array_image(image)

        ids = tokenizer_image_token(prompt, self.tokenizer)
        row, start = expand_image_ids(ids, n_img_tokens)
        pad_to = -(-(len(row) + 1) // self.bucket) * self.bucket
        ids_a, lens, starts = pad_batch([row], [start], pad_to)
        return {
            "images": self._put(images),
            "vision_embeds": self._put(vision_embeds),
            "ids": self._put(jnp.asarray(ids_a)),
            "lens": self._put(jnp.asarray(lens)),
            "starts": self._put(jnp.asarray(starts)),
        }

    def _prepare_multi(self, prompt: str, images_list):
        """Multi-image prompts: one <image> sentinel per image; the tower
        encodes all images in one call and spans are overlaid per image
        (reference list/5-D path, llava_arch.py:154-165)."""
        from fastvlm_tpu.ops.splice import expand_image_ids_multi

        cfg = self.cfg
        ids = tokenizer_image_token(prompt, self.tokenizer)
        row, starts = expand_image_ids_multi(ids, cfg.num_image_tokens)
        if len(starts) != len(images_list):
            raise ValueError(
                f"{len(images_list)} images but {len(starts)} <image> tokens")
        pad_to = -(-(len(row) + 1) // self.bucket) * self.bucket
        ids_a, lens, _ = pad_batch([row], [0], pad_to)

        proc = jnp.concatenate([
            jnp.asarray(process_images([im], self.processor, cfg), self._dtype)
            if hasattr(im, "convert") else self.prepare_array_image(im)
            for im in images_list
        ])
        vis = self._encode_multi_jit(proc)
        starts_arr = jnp.asarray(np.asarray(starts, np.int32)[None])
        return {
            "images": None,
            "vision_embeds": self._put(vis[None]),  # (1,M,N,D) multi-span
            "ids": self._put(jnp.asarray(ids_a)),
            "lens": self._put(jnp.asarray(lens)),
            "starts": self._put(starts_arr),
        }

    def _encode_multi_jit(self, images):
        cfg = self.cfg

        @jax.jit
        def f(params, images):
            return vlm.encode_images(params, cfg, images)

        return f(self.params, images)

    def _encode_tiles_jit(self, tiles, grid_shape, original_size):
        """AnyRes encode as two jit units: the tower+projector keyed only by
        tile count, and a cheap merge keyed by (grid_shape, crop_box). Exact
        pixel sizes never key a compile — arbitrary upload sizes reuse the
        one expensive tower program per grid shape (VERDICT r1 #4)."""
        tower, merge, _ = self._tile_fns
        grids = tower(self.params, tiles)
        crop_box = vlm.anyres_crop_box(self.cfg, grid_shape, original_size)
        return merge(self.params, grids, grid_shape, crop_box)

    @property
    def _tile_fns(self):
        if not hasattr(self, "_tile_fns_cached"):
            import functools

            cfg = self.cfg
            # trace-time side effects: count compiles for tests/diagnostics
            counters = {"tower": 0, "merge": 0}

            @jax.jit
            def tower(params, tiles):
                counters["tower"] += 1
                return vlm.encode_tile_grids(params, cfg, tiles)

            @functools.partial(jax.jit,
                               static_argnames=("grid_shape", "crop_box"))
            def merge(params, grids, grid_shape, crop_box):
                counters["merge"] += 1
                return vlm.merge_tile_grids(params, cfg, grids, grid_shape,
                                            crop_box)

            self._tile_fns_cached = (tower, merge, counters)
        return self._tile_fns_cached

    # ---------------- generation ----------------

    def stream(
        self,
        prompt: str,
        image=None,
        *,
        max_new_tokens: Optional[int] = None,
        sampling: SamplingParams = SamplingParams(),
        stop_strings: Sequence[str] = (),
        seed: Optional[int] = None,
        spec: bool = False,
        draft_k: int = 8,
    ) -> Iterator[Dict[str, Any]]:
        """Yields {"text": full_text_so_far, "stats": {...}} dicts.

        Mirrors the worker's incremental protocol
        (reference model_worker.py:122-193) with chunked on-device decode.
        ``spec=True`` (greedy only) decodes each chunk with prompt-lookup
        speculative verify passes (vlm.spec_stream_chunk) — same tokens,
        1.5-2x fewer device steps; streaming cadence is preserved.
        """
        cfg = self.cfg
        max_new = max_new_tokens or cfg.max_new_tokens
        if spec and sampling.temperature > 0:
            raise ValueError("spec streaming is greedy-only (temperature 0)")
        kw_ids = self._keyword_token_ids(stop_strings)
        inputs = self.prepare(prompt, image)
        ids, lens, starts = inputs["ids"], inputs["lens"], inputs["starts"]
        b, t = ids.shape
        stats = RequestStats(prompt_tokens=int(_sync(lens)[0]))

        # decode always dispatches FULL self.chunk-wide chunks (the tail is
        # truncated host-side): one compiled decode program per engine
        # instead of one per distinct max_new residue — fewer cold-shape
        # stalls in serving, and the cache is sized so overshoot writes
        # stay in-bounds
        n_chunks = -(-max_new // self.chunk)
        cache = self.shard_cache(init_cache(
            cfg.decoder.num_layers, b,
            (vlm.spec_cache_len(t, max_new, draft_k) if spec
             else t + n_chunks * self.chunk),
            cfg.decoder.num_kv_heads, cfg.decoder.head_dim, self._kv_dtype))

        key = self._put(jax.random.PRNGKey(
            seed if seed is not None else (time.time_ns() % 2**31)))

        t0 = time.perf_counter()
        logits, cache = self._prefill_jit(
            self.params, inputs["images"], ids, lens, starts, cache,
            inputs["vision_embeds"])
        key, sub = jax.random.split(key)
        from fastvlm_tpu.ops.sampling import sample
        tok = sample(sub, logits, sampling)
        first = int(_sync(tok)[0])
        stats.ttft_ms = (time.perf_counter() - t0) * 1000

        out_ids: List[int] = [] if first in self.eos_ids else [first]
        done_host = first in self.eos_ids
        # single-token stop keyword emitted as the very first token
        # (reference KeywordsStoppingCriteria checks from the first
        # generated token)
        for kid in kw_ids:
            if out_ids and len(out_ids) >= len(kid) \
                    and out_ids[-len(kid):] == kid:
                del out_ids[-len(kid):]
                done_host = True
        done = self._put(jnp.asarray([done_host]))
        text = self._decode_text(out_ids)
        yield {"text": text, "stats": stats.as_dict()}

        t_dec = time.perf_counter()
        emitted = 1
        decode_tokens = 0  # chunk slots actually consumed (incl. the EOS)

        def consume(tokens) -> bool:
            """Append host-fetched tokens to out_ids; True => stop.

            Token-level keyword stop (reference KeywordsStoppingCriteria,
            mm_utils.py:218-250): the output tail matches a keyword's token
            ids exactly — catches stop sequences whose tokens decode to
            nothing (special tokens). Post-EOS slots are masked to 0 on
            device in the dense path; the spec path truncates counts at the
            EOS inclusive, so both paths end at the first EOS seen here."""
            nonlocal decode_tokens
            for tk in tokens:
                tk = int(tk)
                decode_tokens += 1
                if tk in self.eos_ids:
                    return True
                out_ids.append(tk)
                for kid in kw_ids:
                    if len(out_ids) >= len(kid) and out_ids[-len(kid):] == kid:
                        del out_ids[-len(kid):]
                        return True
            return False

        def emit(stop: bool):
            stats.decode_tokens = decode_tokens
            stats.decode_ms = (time.perf_counter() - t_dec) * 1000
            text = self._decode_text(out_ids)
            for s in stop_strings:
                if s and s in text:
                    text = text.split(s)[0]
                    stop = True
            return stop, {"text": text, "stats": stats.as_dict()}

        if spec:
            # Prompt-lookup speculative streaming: each dispatch runs m
            # verify passes and commits m..m*(draft_k+1) tokens — one sync
            # per dispatch, same greedy tokens, fewer device steps.
            carry = vlm.spec_carry_init(
                cfg, tok, cache, ids, lens,
                max_new_tokens=max_new, draft_k=draft_k,
                eos_ids=self.eos_ids)
            m = max(1, -(-self.chunk // (draft_k + 1)))
            while not done_host and emitted < max_new:
                toks, counts, carry = vlm.spec_stream_chunk(
                    self.params, cfg, carry, m=m, max_new_tokens=max_new,
                    eos_ids=self.eos_ids, draft_k=draft_k)
                host_toks, host_n = jax.device_get((toks, counts))
                n = int(host_n[0])
                if n == 0:  # every row finished on a previous dispatch
                    break
                emitted += n
                stats.spec_steps += m  # passes dispatched (upper bound)
                # each pass commits 1 bonus token regardless of drafts, so
                # accepted drafts ≈ committed - passes (a lower bound: passes
                # after the row finished commit nothing); generate_spec has
                # the exact device counters, the stream keeps host accounting
                stats.spec_accept_rate = (
                    max(0, emitted - 1 - stats.spec_steps)
                    / max(1, stats.spec_steps * draft_k))
                done_host = consume(host_toks[0][:n])
                done_host, chunk = emit(done_host)
                yield chunk
            return

        while not done_host and emitted < max_new:
            take = min(self.chunk, max_new - emitted)
            toks, done, tok, cache, key = vlm.decode_chunk(
                self.params, cfg, tok, done, cache, key,
                k=self.chunk, eos_ids=self.eos_ids, sampling=sampling)
            host_toks = _sync(toks)[0][:take]
            emitted += take
            done_host = consume(host_toks)
            done_host = done_host or bool(_sync(done)[0])
            done_host, chunk = emit(done_host)
            yield chunk

    def generate(self, prompt: str, image=None, **kw) -> Tuple[str, Dict[str, Any]]:
        last = {"text": "", "stats": {}}
        for last in self.stream(prompt, image, **kw):
            pass
        return last["text"], last["stats"]

    def generate_beam(
        self,
        prompt: str,
        image=None,
        *,
        num_beams: int = 4,
        max_new_tokens: Optional[int] = None,
        length_penalty: float = 1.0,
    ) -> Tuple[str, Dict[str, Any]]:
        """Deterministic beam-search generate (reference predict.py:57,67
        routes --num_beams through HF generate; ops/beam.py is the
        device-resident equivalent — W folded into the batch axis, one
        jitted fixed-length search)."""
        from fastvlm_tpu.ops.beam import beam_search

        cfg = self.cfg
        max_new = max_new_tokens or cfg.max_new_tokens
        inputs = self.prepare(prompt, image)
        ids, lens, starts = inputs["ids"], inputs["lens"], inputs["starts"]
        b, t = ids.shape
        stats = RequestStats(prompt_tokens=int(_sync(lens)[0]))
        cache = self.shard_cache(init_cache(
            cfg.decoder.num_layers, b, t + max_new,
            cfg.decoder.num_kv_heads, cfg.decoder.head_dim, self._kv_dtype))
        t0 = time.perf_counter()
        logits, cache = self._prefill_jit(
            self.params, inputs["images"], ids, lens, starts, cache,
            inputs["vision_embeds"])
        res = beam_search(
            self.params, cfg, logits, cache, num_beams=num_beams,
            max_new_tokens=max_new, eos_ids=self.eos_ids,
            length_penalty=length_penalty)
        n = int(_sync(res.lengths)[0])
        toks = [int(x) for x in _sync(res.tokens)[0][:n]]
        # prefill + search run as one fused dispatch chain, so both timing
        # fields cover the full search window (tok_per_s = end-to-end rate)
        stats.ttft_ms = (time.perf_counter() - t0) * 1000
        stats.decode_ms = stats.ttft_ms
        stats.decode_tokens = n
        if toks and toks[-1] in self.eos_ids:
            toks = toks[:-1]
        return self._decode_text(toks), stats.as_dict()

    def generate_spec(
        self,
        prompt: str,
        image=None,
        *,
        max_new_tokens: Optional[int] = None,
        draft_k: int = 8,
        stop_strings: Sequence[str] = (),
    ) -> Tuple[str, Dict[str, Any]]:
        """Greedy generate with prompt-lookup speculative decoding.

        Same tokens as greedy ``generate`` in fewer device steps (each
        verify pass commits 1..draft_k+1 tokens; b1 decode streams every
        weight per step, so the batched verify is nearly free —
        vlm.spec_decode / ops/speculative.py). The reference's HF stack
        exposes this as ``generate(prompt_lookup_num_tokens=...)``; here it
        is a device-resident loop. Extension knob: not a reference CLI flag.
        """
        cfg = self.cfg
        max_new = max_new_tokens or cfg.max_new_tokens
        inputs = self.prepare(prompt, image)
        ids, lens, starts = inputs["ids"], inputs["lens"], inputs["starts"]
        b, t = ids.shape
        stats = RequestStats(prompt_tokens=int(_sync(lens)[0]))
        cache = self.shard_cache(init_cache(
            cfg.decoder.num_layers, b,
            vlm.spec_cache_len(t, max_new, draft_k),
            cfg.decoder.num_kv_heads, cfg.decoder.head_dim, self._kv_dtype))
        t0 = time.perf_counter()
        logits, cache = self._prefill_jit(
            self.params, inputs["images"], ids, lens, starts, cache,
            inputs["vision_embeds"])
        res = vlm.spec_decode(
            self.params, cfg, logits, cache, ids, lens,
            max_new_tokens=max_new, eos_ids=self.eos_ids, draft_k=draft_k)
        n = int(_sync(res.num_generated)[0])
        toks = [int(x) for x in _sync(res.tokens)[0][:n]]
        stats.decode_ms = (time.perf_counter() - t0) * 1000
        stats.decode_tokens = n
        stats.spec_steps = int(_sync(res.steps))
        stats.spec_accept_rate = (
            float(_sync(res.accepted)) / max(1, float(_sync(res.drafted))))
        if toks and toks[-1] in self.eos_ids:
            toks = toks[:-1]
        # host-side keyword + stop-string trimming (single trailing pass:
        # spec commits whole spans, so the mid-stream scan in stream() is
        # replaced by one post-hoc cut at the earliest stop site)
        for kid in self._keyword_token_ids(stop_strings):
            for i in range(len(toks) - len(kid) + 1):
                if toks[i:i + len(kid)] == kid:
                    toks = toks[:i]
                    break
        text = self._decode_text(toks)
        for s in stop_strings:
            if s and s in text:
                text = text.split(s)[0]
        return text, stats.as_dict()

    def chat(self, user_prompt: str, image=None, **kw):
        """Convenience: wraps user_prompt in the conversation template."""
        return self.generate(self.build_prompt(user_prompt), image, **kw)

    # ---------------- internals ----------------

    def _keyword_token_ids(self, stop_strings) -> List[List[int]]:
        """Tokenize stop keywords the reference way (mm_utils.py:219-230):
        encode each keyword, drop a leading BOS; decode-time the output tail
        is compared token-for-token."""
        out: List[List[int]] = []
        bos = getattr(self.tokenizer, "bos_token_id", None)
        for s in stop_strings:
            if not s:
                continue
            try:
                enc = self.tokenizer(s)
                ids = list(getattr(enc, "input_ids", enc))
            except Exception:
                continue
            if len(ids) > 1 and bos is not None and ids[0] == bos:
                ids = ids[1:]
            if ids:
                out.append([int(i) for i in ids])
        return out

    def _decode_text(self, ids: List[int]) -> str:
        if not ids:
            return ""
        return self.tokenizer.decode(ids, skip_special_tokens=True)

    @property
    def _prefill_jit(self):
        """Module-level jit (vlm._prefill_jit, cfg static): engines with
        EQUAL configs share one compile cache — per-engine closures used to
        recompile the full prefill graph for every Engine instance (bench
        A/Bs, the test suite, worker restarts)."""
        cfg = self.cfg

        def dispatch(params, images, ids, lens, starts, cache, vis=None):
            return vlm._prefill_jit(params, cfg, images, ids, lens, starts,
                                    cache, vision_embeds=vis)

        return dispatch

    @property
    def _prefill_suffix_jit(self):
        """Suffix prefill after ``offset`` cached prefix tokens
        (vlm.prefill_continue) — the serving prefix-cache admission path.
        ``offset`` is a TRACED scalar so every cached length shares one
        compiled specialization per (suffix bucket, table width); the jit
        itself is module-level (cfg static, shared across engines)."""
        cfg = self.cfg

        def dispatch(params, images, ids, lens, starts, offset, cache):
            offset = jnp.asarray(offset, jnp.int32)
            return vlm._prefill_continue_jit(params, cfg, images, ids, lens,
                                             starts, offset, cache)

        return dispatch


def build_engine(model_path: Optional[str] = None, *, random_tiny: bool = False,
                 dtype: str = "bfloat16", platform: Optional[str] = None,
                 **engine_kw) -> Engine:
    """Factory mirroring load_pretrained_model (reference model/builder.py:26):
    checkpoint dir -> (tokenizer, model, processor) wrapped in an Engine.

    ``platform``: force a jax backend ('cpu'/'axon'/'tpu'). Needed because the
    axon plugin rewrites jax_platforms at import, ignoring JAX_PLATFORMS.
    """
    if platform:
        jax.config.update("jax_platforms", platform)
    enable_compilation_cache()
    if random_tiny:
        from fastvlm_tpu.config import (
            FastViTConfig, ProjectorConfig, Qwen2Config)
        from fastvlm_tpu.data.preprocessing import ByteTokenizer

        vision = FastViTConfig(layers=(1, 1, 1, 1, 1),
                               embed_dims=(8, 16, 32, 64, 128),
                               image_size=256, attn_head_dim=16)
        decoder = Qwen2Config(vocab_size=258, hidden_size=64, num_layers=2,
                              num_heads=4, num_kv_heads=2, head_dim=16,
                              intermediate_size=128)
        cfg = FastVLMConfig(
            vision=vision, decoder=decoder,
            projector=ProjectorConfig(mm_hidden_size=vision.out_channels,
                                      hidden_size=64))
        params = vlm.init(jax.random.PRNGKey(0), cfg)
        tok = ByteTokenizer()
        engine_kw.setdefault("eos_ids", (tok.eos_token_id,))
        return Engine(cfg, params, tok, **engine_kw)

    from transformers import AutoTokenizer

    from fastvlm_tpu.utils.checkpoint import load_vlm

    cfg, params = load_vlm(model_path, dtype=resolve_dtype(dtype))
    tokenizer = AutoTokenizer.from_pretrained(model_path)
    return Engine(cfg, params, tokenizer, **engine_kw)

"""Batch inference / serving: top-K recommendations from a trained model.

The reference has no serving path (evaluation doubles as its only
inference, SURVEY.md section 4); production deployment needs one.  The
``Recommender`` precomputes the fused item-embedding table once (the same
jitted SAN pass evaluation uses), then answers queries with a single
device dispatch: gather sequence rows -> user encoder -> full-catalog
scores -> mask history -> top-K.

    rec = Recommender.from_trainer(trainer)
    items, scores = rec.top_k(seq_ids, k=10)   # (B, k) item ids

Works with any trainer exposing the eval surface (cached / uncached / id).

Command line (artifact produced by ``save()`` or the trainer's
``--export_recommender`` flag; input rows in the behaviors-TSV layout
``user_id \t space-separated item ids``):

    python -m iisan_tpu.serve artifact.npz --input seqs.tsv \
        --out recs.tsv [--k 10] [--batch 256] [--include-history]

Online mode (threaded HTTP, bucketed shapes, one dispatch per request):

    python -m iisan_tpu.serve artifact.npz --http 0.0.0.0:8000
    curl -X POST :8000/recommend -d '{"sequences": [[5, 17, 102]], "k": 10}'
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops.metrics import mask_history
from .ops.quant import QuantTaps


def _table_lookup(table, ids):
    """Row gather that dequantizes int8 tables on the gathered rows only
    (ops/quant.gather_rows is the polymorphic implementation)."""
    from .ops.quant import gather_rows

    out = gather_rows(table, ids)
    if isinstance(table, QuantTaps):  # (B, L, 1, D) -> (B, L, D)
        out = out[..., 0, :]
    return out


def _score_catalog(prec, table):
    """(B, D) user states x the full table -> (B, N) fp32 scores.

    For an int8 table the per-row scale factors OUT of the matmul
    (scores[:, n] = (prec @ q.T)[:, n] * s[n]), so scoring reads only
    the int8 bytes from HBM — no dense dequantized copy ever exists.
    """
    if isinstance(table, QuantTaps):
        raw = jnp.dot(prec.astype(jnp.float32),
                      table.q[:, 0, :].T.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
        return raw * table.scale[:, 0, 0].astype(jnp.float32)[None, :]
    return jnp.dot(prec.astype(jnp.float32), table.T.astype(jnp.float32),
                   preferred_element_type=jnp.float32)


def _catalog_rows(rec) -> int:
    """Table rows (catalog + pad) of a Recommender or ShardedRecommender."""
    return int(getattr(rec, "n_rows", 0) or rec.fused_table.shape[0])


@functools.partial(jax.jit, static_argnums=(0, 6))
def _topk_step(model, params, fused_table, tokens, log_mask, history, k):
    input_embs = _table_lookup(fused_table, tokens)
    prec = model.apply({"params": params}, input_embs, log_mask,
                       method=model.user_scores)[:, -1, :]
    scores = _score_catalog(prec, fused_table)
    scores = mask_history(scores, history)
    scores = scores.at[:, 0].set(-jnp.inf)  # never recommend the pad item
    top_scores, top_ids = jax.lax.top_k(scores, k)
    return top_ids, top_scores


class Recommender:
    """Frozen-table batch recommender."""

    def __init__(self, model, params, fused_table, max_seq_len: int):
        self.model = model
        self.params = params
        self.fused_table = fused_table
        self.max_seq_len = max_seq_len

    @classmethod
    def from_trainer(cls, trainer) -> "Recommender":
        if hasattr(trainer, "fused_item_table"):
            table = trainer.fused_item_table()
        elif hasattr(trainer, "item_embedding_tables"):
            table = trainer.item_embedding_tables()
        else:  # id pipeline
            table = trainer.params["id_embedding"]["embedding"]
        return cls(trainer.model, trainer.params, table,
                   trainer.cfg.max_seq_len)

    def _prep(self, seqs, hist_len: int = None
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Ragged python sequences -> left-padded tokens/log_mask/history.

        ``hist_len`` pads the history axis to a caller-chosen width so
        many calls share one jitted shape (the CLI passes the global max
        over its whole input file; per-chunk maxima would recompile the
        full-catalog graph once per distinct length)."""
        L = self.max_seq_len
        b = len(seqs)
        tokens = np.zeros((b, L), np.int32)
        log_mask = np.zeros((b, L), np.float32)
        hist_len = max(max((len(s) for s in seqs), default=1), 1,
                       hist_len or 1)
        history = np.zeros((b, hist_len), np.int32)
        for i, s in enumerate(seqs):
            s = list(s)[-L:]
            tokens[i, L - len(s):] = s
            log_mask[i, L - len(s):] = 1.0
            full = list(seqs[i])
            history[i, :len(full)] = full
        return tokens, log_mask, history

    # ------------------------------------------------------------------
    def quantize_table(self) -> "Recommender":
        """Return a Recommender whose item table is int8 rows + fp32
        per-row scales: ~4x less serving HBM/disk than fp32. Scoring
        never dequantizes the catalog (the row scale factors out of the
        matmul, `_score_catalog`); only gathered input rows dequantize.
        Row-relative quantization error is <=0.45% RMS (ops/quant.py)."""
        from .ops.quant import quantize_taps

        if isinstance(self.fused_table, QuantTaps):
            return self
        t = quantize_taps(np.asarray(self.fused_table,
                                     dtype=np.float32)[:, None, :],
                          out_dtype="float32")
        # quantize_taps returns HOST numpy leaves; put them on device once.
        # Leaving them host-side makes every _topk_step call re-upload the
        # whole catalog table (the r2 int8-serving latency regression:
        # 2-3x bf16 p50 was tunnel transfer, not int8 math).
        t = QuantTaps(jnp.asarray(t.q), jnp.asarray(t.scale),
                      out_dtype=t.out_dtype)
        return Recommender(self.model, self.params, t, self.max_seq_len)

    def save(self, path: str) -> None:
        """Export a deployable artifact: the fused item table + the
        user-encoder params — everything top_k needs, no trainer, no
        caches, no towers.  One .npz file."""
        import jax

        # Cast to float32 for storage: np.savez silently stores ml_dtypes
        # bfloat16 as raw void ('|V2'), which np.load cannot interpret —
        # the default compute dtype IS bfloat16, so this cast is load-
        # bearing, not cosmetic.
        def store(x):
            x = np.asarray(x)
            return x.astype(np.float32) if x.dtype.kind not in "iuf" else x

        flat = {}
        for kp, leaf in jax.tree_util.tree_leaves_with_path(
                {"user_encoder": self.params["user_encoder"]}):
            key = "/".join(str(getattr(k, "key", k)) for k in kp)
            flat[f"param:{key}"] = store(leaf)
        if isinstance(self.fused_table, QuantTaps):
            flat["table_q"] = np.asarray(self.fused_table.q)
            flat["table_scale"] = np.asarray(self.fused_table.scale)
        else:
            flat["fused_table"] = store(self.fused_table)
        np.savez(path,
                 max_seq_len=np.int32(self.max_seq_len),
                 n_layers=np.int32(self._encoder_layers()),
                 n_heads=np.int32(self._encoder_heads()), **flat)

    def _encoder_layers(self) -> int:
        te = self.params["user_encoder"]["transformer_encoder"]
        return sum(1 for k in te if k.startswith("transformer_blocks_"))

    def _encoder_heads(self) -> int:
        return getattr(self.model, "num_attention_heads", 2)

    @classmethod
    def load(cls, path: str) -> "Recommender":
        """Rebuild a Recommender from a ``save()`` artifact."""
        from .models.model import IISANRecModel
        from .models.san import SideAdapterNetwork

        z = np.load(path)
        params: dict = {}
        for key in z.files:
            if not key.startswith("param:"):
                continue
            node = params
            parts = key[len("param:"):].split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key]
        # Device-put the table and params at load time: npz arrays are
        # host numpy, and host-side jit args re-transfer on every call.
        if "table_q" in z.files:
            table = QuantTaps(jnp.asarray(z["table_q"]),
                              jnp.asarray(z["table_scale"]),
                              out_dtype="float32")
        else:
            table = jnp.asarray(z["fused_table"])
        params = jax.tree_util.tree_map(jnp.asarray, params)
        L = int(z["max_seq_len"])
        dim = int(table.shape[-1])
        model = IISANRecModel(
            san=SideAdapterNetwork(embedding_dim=dim),
            embedding_dim=dim, max_seq_len=L,
            num_attention_heads=int(z["n_heads"]),
            transformer_block=int(z["n_layers"]), drop_rate=0.0)
        return cls(model, params, table, L)

    def top_k(self, seqs, k: int = 10, exclude_history: bool = True,
              hist_len: int = None) -> Tuple[np.ndarray, np.ndarray]:
        """seqs: iterable of item-id sequences (most recent last).

        Returns (item_ids, scores), each (B, k); history items are excluded
        by default (the evaluation convention, metrics.py:238-240).
        """
        tokens, log_mask, history = self._prep(seqs, hist_len)
        if not exclude_history:
            history = np.zeros_like(history)
        ids, scores = _topk_step(
            self.model, self.params, self.fused_table,
            jnp.asarray(tokens), jnp.asarray(log_mask),
            jnp.asarray(history), k)
        return np.asarray(ids), np.asarray(scores)


class ShardedRecommender:
    """Catalog-sharded serving over a device mesh.

    The fused item table is the serving-memory hog (2 GB+ at Versa's
    81×8192-derived geometries with large catalogs); here it shards row-
    wise over a mesh axis and a query runs as ONE shard_map dispatch:

      - the input-sequence embedding gather is a sharded lookup (each
        device gathers the rows it owns, `psum` combines),
      - the user encoder runs replicated (tiny),
      - full-catalog scoring is a local matmul against the table shard,
      - top-K merges per-shard candidates (local top-K → `all_gather`
        of k·n_dev candidates → final top-K), so no device ever
        materializes the full (B, catalog) score matrix.

    Bit-compatible with `Recommender.top_k` (same scores; ties may
    reorder).  Accepts ragged sequences exactly like `Recommender`.
    """

    def __init__(self, rec: Recommender, mesh=None, axis: str = None):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        if mesh is None:
            mesh = Mesh(np.asarray(jax.devices()), ("model",))
        self.mesh = mesh
        self.axis = axis or mesh.axis_names[-1]
        n_dev = mesh.shape[self.axis]
        if len(mesh.axis_names) != 1:
            raise ValueError("ShardedRecommender takes a 1-D mesh; got "
                             f"{mesh.axis_names}")
        src = rec.fused_table
        self.quant = isinstance(src, QuantTaps)
        if self.quant:
            q = np.asarray(src.q[:, 0, :])
            s = np.asarray(src.scale[:, 0, 0], dtype=np.float32)
            self.n_rows, self.dim = q.shape
        else:
            # keep the source dtype resident (a bf16 table stays bf16 -
            # halving shard HBM is the point); matmuls cast in-flight
            table = np.asarray(src)
            self.n_rows, self.dim = table.shape
        self.rows_local = -(-self.n_rows // n_dev)
        n_pad = self.rows_local * n_dev
        row_sh = NamedSharding(mesh, P(self.axis, None))
        if self.quant:
            q_pad = np.zeros((n_pad, self.dim), q.dtype)
            q_pad[: self.n_rows] = q
            s_pad = np.zeros((n_pad,), np.float32)
            s_pad[: self.n_rows] = s
            self.tables = (
                jax.device_put(q_pad, row_sh),
                jax.device_put(s_pad, NamedSharding(mesh, P(self.axis))))
        else:
            padded = np.zeros((n_pad, self.dim), table.dtype)
            padded[: self.n_rows] = table
            self.tables = (jax.device_put(padded, row_sh),)
        self.params = jax.device_put(rec.params, NamedSharding(mesh, P()))
        self.model = rec.model
        self.max_seq_len = rec.max_seq_len
        self._prep = functools.partial(Recommender._prep, self)
        self._steps = {}

    # ------------------------------------------------------------------
    def _step_fn(self, B: int, H: int, k: int):
        key = (B, H, k)
        if key in self._steps:
            return self._steps[key]
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axis, Nl, N = self.axis, self.rows_local, self.n_rows
        model, quant = self.model, self.quant
        k_local = min(k, Nl)  # a shard contributes at most Nl candidates

        def body(*args):
            if quant:
                q_l, s_l, params, tokens, log_mask, history = args
            else:
                (table_l, params, tokens, log_mask, history), s_l = args, None
            off = jax.lax.axis_index(axis) * Nl
            loc = tokens - off
            idx = jnp.clip(loc, 0, Nl - 1)
            if quant:
                emb = (jnp.take(q_l, idx, axis=0).astype(jnp.float32)
                       * jnp.take(s_l, idx, axis=0)[..., None])
            else:
                emb = jnp.take(table_l, idx, axis=0)
            emb = jnp.where(((loc >= 0) & (loc < Nl))[..., None], emb, 0.0)
            emb = jax.lax.psum(emb, axis)           # sharded row lookup
            prec = model.apply({"params": params}, emb, log_mask,
                               method=model.user_scores)[:, -1, :]
            if quant:  # row scale factors out of the matmul (see
                # _score_catalog) - only the int8 bytes leave HBM
                scores = jnp.dot(prec.astype(jnp.float32),
                                 q_l.T.astype(jnp.float32),
                                 preferred_element_type=jnp.float32)
                scores = scores * s_l[None, :]
            else:
                scores = jnp.dot(prec.astype(jnp.float32),
                                 table_l.T.astype(jnp.float32),
                                 preferred_element_type=jnp.float32)
            gids = off + jnp.arange(Nl)
            # padding rows (>= N), the pad item (global col 0), history
            scores = jnp.where((gids >= N)[None, :], -jnp.inf, scores)
            scores = jnp.where((gids == 0)[None, :], -jnp.inf, scores)
            rows = jnp.arange(B)[:, None]
            # negative scatter indices WRAP NumPy-style before mode="drop"
            # applies, so route off-shard ids to the positive OOB sentinel
            # Nl (dropped) instead of letting below-shard ids wrap
            hist_loc = history - off
            hist_idx = jnp.where((hist_loc >= 0) & (hist_loc < Nl),
                                 hist_loc, Nl)
            scores = scores.at[rows, hist_idx].set(-jnp.inf, mode="drop")
            top_s, top_i = jax.lax.top_k(scores, k_local)
            all_s = jax.lax.all_gather(top_s, axis)   # (n_dev, B, k_local)
            all_i = jax.lax.all_gather(top_i + off, axis)
            all_s = jnp.moveaxis(all_s, 0, 1).reshape(B, -1)
            all_i = jnp.moveaxis(all_i, 0, 1).reshape(B, -1)
            fin_s, pos = jax.lax.top_k(all_s, k)
            fin_i = jnp.take_along_axis(all_i, pos, axis=1)
            return fin_i, fin_s

        # check_vma=False: the outputs ARE replicated (every device runs
        # the identical final top_k over the all_gathered candidates) but
        # the static checker cannot infer that through all_gather
        table_specs = (P(axis, None), P(axis)) if quant else (P(axis, None),)
        fn = jax.jit(shard_map(
            body, mesh=self.mesh,
            in_specs=table_specs + (P(), P(), P(), P()),
            out_specs=(P(), P()), check_vma=False))
        self._steps[key] = fn
        return fn

    def top_k(self, seqs, k: int = 10, exclude_history: bool = True,
              hist_len: int = None) -> Tuple[np.ndarray, np.ndarray]:
        tokens, log_mask, history = self._prep(seqs, hist_len)
        if not exclude_history:
            history = np.zeros_like(history)
        if not 0 < k < self.n_rows:
            raise ValueError(f"k must be in 1..{self.n_rows - 1}")
        fn = self._step_fn(tokens.shape[0], history.shape[1], k)
        ids, scores = fn(*self.tables, self.params, jnp.asarray(tokens),
                         jnp.asarray(log_mask), jnp.asarray(history))
        return np.asarray(ids), np.asarray(scores)


def _bucket(n: int, cap: int) -> int:
    """Next power of two >= n, capped: requests share a handful of jitted
    shapes instead of compiling the full-catalog graph per geometry."""
    b = 1
    while b < min(n, cap):
        b *= 2
    return min(b, cap)


def serve_http(rec: Recommender, host: str, port: int,
               max_batch: int = 256):
    """Online serving: a threaded HTTP server over one Recommender.

    POST /recommend  {"sequences": [[item ids...], ...], "k": 10,
                      "exclude_history": true}
        -> {"items": [[...], ...], "scores": [[...], ...]}
    GET  /healthz    -> {"status": "ok", "catalog_items": N, ...}

    Batch and history widths are bucketed to powers of two so concurrent
    traffic reuses a handful of compiled shapes; the device dispatch is
    serialized with a lock (one chip).  Returns the server object —
    call ``serve_forever()`` (the CLI does).
    """
    import json as _json
    import logging
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    log = logging.getLogger("iisan_tpu")
    lock = threading.Lock()
    # works over a Recommender or a ShardedRecommender (same query surface)
    n_items = _catalog_rows(rec) - 1
    MAX_HIST = 4096  # longest accepted client sequence (shape-cap)

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = _json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok", "catalog_items": n_items,
                                 "max_seq_len": rec.max_seq_len})
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/recommend":
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = _json.loads(self.rfile.read(length) or b"{}")
                seqs = req["sequences"]
                k = int(req.get("k", 10))
                exclude = bool(req.get("exclude_history", True))
                if (not isinstance(seqs, list) or not seqs
                        or not all(isinstance(s, list) and s for s in seqs)):
                    raise ValueError(
                        "sequences must be a non-empty list of non-empty "
                        "item-id lists")
                if len(seqs) > max_batch:
                    raise ValueError(f"batch {len(seqs)} > max {max_batch}")
                for s in seqs:
                    if len(s) > MAX_HIST:
                        raise ValueError(
                            f"sequence length {len(s)} > max {MAX_HIST}")
                    bad = [i for i in s if not (isinstance(i, int)
                                                and 0 < i <= n_items)]
                    if bad:
                        raise ValueError(f"item id(s) {bad[:5]} out of "
                                         f"range 1..{n_items}")
                if not 0 < k <= n_items:
                    raise ValueError(f"k must be in 1..{n_items}")
            except (KeyError, ValueError, TypeError) as e:
                self._send(400, {"error": str(e)})
                return
            n = len(seqs)
            b = _bucket(n, max_batch)
            hist = _bucket(max(len(s) for s in seqs), MAX_HIST)
            # bucket k too: it is a static jit arg, so arbitrary client
            # values would otherwise compile (and cache) one full-catalog
            # program per distinct k - truncate the response afterwards
            kb = min(_bucket(k, 1 << 30), n_items)
            padded = seqs + [[1]] * (b - n)
            with lock:  # one chip: serialize device dispatches
                ids, scores = rec.top_k(padded, k=kb,
                                        exclude_history=exclude,
                                        hist_len=hist)
            ids, scores = ids[:n, :k], scores[:n, :k]
            # -inf scores (k exceeded the user's unmasked catalog) are
            # not valid JSON; report those slots as null item / null score
            finite = np.isfinite(scores)
            self._send(200, {
                "items": [[int(i) if f else None
                           for i, f in zip(row, frow)]
                          for row, frow in zip(ids, finite)],
                "scores": [[float(s) if f else None
                            for s, f in zip(row, frow)]
                           for row, frow in zip(scores, finite)]})

        def log_message(self, fmt, *args):  # route to the package logger
            log.info("http %s", fmt % args)

    server = ThreadingHTTPServer((host, port), Handler)
    log.info("serving on %s:%d (catalog %d items)", host, port, n_items)
    return server


def main(argv=None) -> int:
    """Batch-serving CLI over a ``save()`` artifact."""
    import argparse

    ap = argparse.ArgumentParser(
        description="top-K recommendations from a serving artifact")
    ap.add_argument("artifact", help=".npz from Recommender.save / "
                    "--export_recommender")
    ap.add_argument("--input",
                    help="TSV: user_id\\tspace-separated item ids")
    ap.add_argument("--out",
                    help="output TSV: user_id\\ttop-k ids\\tscores")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--include-history", action="store_true",
                    help="allow recommending items already in the history")
    ap.add_argument("--http", metavar="HOST:PORT",
                    help="serve online over HTTP instead of batch-file "
                         "mode (POST /recommend, GET /healthz)")
    ap.add_argument("--shard", action="store_true",
                    help="shard the item table over all visible devices "
                         "(ShardedRecommender): per-shard scoring + "
                         "candidate-merge top-K for catalogs too large "
                         "for one chip's HBM")
    ap.add_argument("--quant", choices=["none", "int8"], default="none",
                    help="int8: serve from an int8 item table (~4x less "
                         "HBM; the per-row scale factors out of the "
                         "scoring matmul, so the catalog is never "
                         "densely dequantized)")
    ap.add_argument("--save-as", metavar="OUT.npz",
                    help="re-export the (e.g. --quant int8) artifact and "
                         "exit - quantize once, deploy the small file")
    args = ap.parse_args(argv)

    rec = Recommender.load(args.artifact)
    if args.quant == "int8":
        rec = rec.quantize_table()
    if args.save_as:
        rec.save(args.save_as)
        print(f"re-exported {args.artifact} -> {args.save_as} "
              f"(quant={args.quant})")
        return 0
    if args.shard:
        rec = ShardedRecommender(rec)
    if args.http:
        host, _, port = args.http.rpartition(":")
        if not port.isdigit():
            ap.error(f"--http expects HOST:PORT, got {args.http!r}")
        server = serve_http(rec, host or "127.0.0.1", int(port),
                            max_batch=args.batch)
        print(f"serving {args.artifact} on http://{host or '127.0.0.1'}:"
              f"{port} (POST /recommend)", flush=True)
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        return 0
    if not (args.input and args.out):
        ap.error("--input and --out are required (or use --http)")
    users, seqs = [], []
    with open(args.input) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            user, _, id_str = line.partition("\t")
            users.append(user)
            seqs.append([int(t) for t in id_str.split()])
    if not users:
        open(args.out, "w").close()
        print(f"no input rows in {args.input}; wrote empty {args.out}")
        return 0
    n_items = _catalog_rows(rec) - 1
    for u, s in zip(users, seqs):
        if not s:
            raise SystemExit(f"user {u!r} has an empty item history — "
                             "recommendations would be computed from pad "
                             "embeddings only")
        bad = [i for i in s if not 0 < i <= n_items]
        if bad:
            raise SystemExit(f"item id(s) {bad[:5]} out of range "
                             f"1..{n_items} for this artifact")
    # one jitted shape for the whole file: global history width + padded
    # final chunk (per-chunk shapes would recompile the full-catalog
    # graph once per distinct geometry)
    hist_len = max(len(s) for s in seqs)
    with open(args.out, "w") as out:
        for start in range(0, len(users), args.batch):
            chunk = seqs[start:start + args.batch]
            n = len(chunk)
            chunk = chunk + [[1]] * (args.batch - n)
            ids, scores = rec.top_k(
                chunk, k=args.k, exclude_history=not args.include_history,
                hist_len=hist_len)
            for u, row_ids, row_sc in zip(users[start:start + n],
                                          ids[:n], scores[:n]):
                out.write(u + "\t" + " ".join(str(int(i)) for i in row_ids)
                          + "\t" + " ".join(f"{s:.5f}" for s in row_sc)
                          + "\n")
    print(f"wrote {len(users)} recommendation rows to {args.out}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

"""Feature-circuit discovery engine: dataset averages, node IE, edge IE, faithfulness.

TPU-native redesign of the reference's ``IE`` class (compute_ie.py:13-960), which drives
nnsight runtime interventions on GoogLeNet with one frozen SAE per mixed layer. Here:

- interventions are pure-function splices on ``SeqNet`` (no tracing runtime);
- the clean-model layer gradients come from ONE value_and_grad over injected zero
  perturbations instead of a dedicated trace per batch (compute_ie.py:270-311);
- the per-layer intervened trace + full backward of node IE (compute_ie.py:420-453)
  collapses to a decoder vjp: with stop-gradient on the SAE error and pass-through
  gradient at the spliced output, the encoder-output gradient is EXACTLY the clean
  layer gradient chained through the decoder (property-tested against the literal
  pass_through/splice primitives in tests/test_patching.py);
- edge IE's per-feature ``backward(retain_graph=True)`` loop (compute_ie.py:589-624)
  becomes one vjp with a batched one-hot cotangent stack (vmap) — the hottest reference
  loop becomes a single XLA computation;
- faithfulness's per-variant traces (compute_ie.py:794-886) are one jitted function
  evaluating all ablation variants.

Every per-batch computation is jitted and shape-static; Python only loops over batches
and keeps running averages (sample-weighted, as compute_ie.py:203-207, 459-462).
"""

from __future__ import annotations

import functools
from typing import Callable, Iterable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from sparse_vision_tpu.interp.ie_math import (
    broadcast_average,
    ie_all_channels,
    ie_channel_wise,
    running_mean,
)
from sparse_vision_tpu.interp.patching import loss_and_tap_grads, splice_with_error
from sparse_vision_tpu.models.layers import SeqNet
from sparse_vision_tpu.models.sae import (
    act_from_tokens,
    sae_decode,
    sae_encode,
    tokens_from_act,
)
from sparse_vision_tpu.ops import metrics

# Faithfulness threshold sweep grid (reference: model_pipeline.py:1403; the "4i" flag
# indexes this list).
FAITHFULNESS_THRESHOLDS = (
    1e-10, 1e-9, 1e-8, 1e-7, 1e-6, 1e-5, 3e-5, 6e-5, 9e-5, 1e-4,
    3e-4, 6e-4, 9e-4, 1e-3, 3e-3, 6e-3, 9e-3, 1e-2, 1e-1, 1.0,
)


class FrozenSAE(NamedTuple):
    """A frozen, trained SAE spliced at one backbone layer (reference: one
    ``{layer}_sae`` attribute per mixed layer, compute_ie.py:64-72)."""

    model_name: str  # 'sae_mlp' | 'gated_sae'
    params: dict
    expansion_factor: int


class Averages(NamedTuple):
    """Dataset averages per layer (reference compute_average outputs,
    compute_ie.py:217-226). Conv layers: enc [H,W,C*K], err/out [H,W,C] (NHWC of the
    reference's [C,H,W]); 2-D layers: [C*K] / [C]."""

    enc: dict
    err: dict
    out: dict
    dead: dict  # bool [C*K] — dead across the whole dataset (AND over batches)
    sparsity: dict  # float


class NodeIE(NamedTuple):
    """Node indirect effects per layer (compute_ie.py:455-472): SAE features [C*K],
    SAE error (scalar), raw model neurons [C]."""

    features: dict
    error: dict
    model_neurons: dict


def _mean_over_batch(x: jax.Array) -> jax.Array:
    return jnp.mean(x, axis=0)


class CircuitEngine:
    """Drives the four circuit-discovery passes over a frozen backbone + frozen SAEs.

    ``data`` arguments are iterables of ``(images, labels)`` device-or-host arrays with
    a fixed batch size (XLA static shapes; the reference's drop_last=True loaders have
    the same property, utils.py:335-338).
    """

    def __init__(
        self,
        net: SeqNet,
        params: dict,
        saes: dict[str, FrozenSAE],
        criterion: Callable,
        state: Optional[dict] = None,
        layers: Optional[Sequence[str]] = None,
    ):
        self.net = net
        self.params = params
        self.state = state or {}
        self.saes = saes
        self.criterion = criterion
        # layer order follows the network, like the reference's fixed mixed3a..5b list
        # (compute_ie.py:52)
        self.layers = list(layers) if layers is not None else [
            n for n in net.stage_names if n in saes
        ]
        # every jitted pass takes the weights as RUNTIME ARGUMENTS, not closed-over
        # constants: baking an 86M-param CLIP tower into the HLO makes the program
        # body ~344 MB, which is untraceably slow to serialize and exceeds remote-
        # compile request limits (measured: HTTP 413 on the v5e tunnel, chip_queue
        # round 4). Weights live on-device once; the executable just reads them.
        self._weights = (
            self.params, self.state, {n: s.params for n, s in saes.items()}
        )

    # -- SAE plumbing (model_name/expansion are static metadata; params are traced) --

    def _enc(self, name: str, sae_params: dict, tok: jax.Array) -> jax.Array:
        return sae_encode(self.saes[name].model_name, sae_params, tok)

    def _dec(self, name: str, sae_params: dict, enc: jax.Array) -> jax.Array:
        return sae_decode(self.saes[name].model_name, sae_params, enc)

    # -- 1) dataset averages (reference compute_average, compute_ie.py:95-226) -----

    @functools.cached_property
    def _avg_batch(self):
        @jax.jit
        def f(weights, images):
            params, state, sae_p = weights
            _, taps, _ = self.net.apply(params, images, state=state)
            per_layer = {}
            for name in self.layers:
                act = taps[name]
                tok, transformed = tokens_from_act(act)
                enc = self._enc(name, sae_p[name], tok)
                dec = self._dec(name, sae_p[name], enc)
                err = tok - dec
                # NOTE: stats are computed on the TOKEN matrix (per-token inactivity),
                # exactly like the reference's averages pass, which calls
                # measure_inactive_units on the [NHW, C*K] encoder output BEFORE
                # rearranging (compute_ie.py:154-156) — deliberately different from
                # the per-sample conv semantics the training loop uses.
                dead, sparsity, _ = metrics.measure_inactive_units(
                    enc, self.saes[name].expansion_factor
                )
                if transformed:
                    enc_map = act_from_tokens(enc, act.shape)
                    err_map = act_from_tokens(err, act.shape)
                else:
                    enc_map, err_map = enc, err
                per_layer[name] = {
                    "enc": _mean_over_batch(enc_map),
                    "err": _mean_over_batch(err_map),
                    "out": _mean_over_batch(act),
                    "dead": dead,
                    "sparsity": sparsity,
                }
            return per_layer

        return f

    def compute_averages(self, data: Iterable) -> Averages:
        enc, err, out, dead, spars = {}, {}, {}, {}, {}
        n = 0
        for images, labels in data:
            del labels
            b = images.shape[0]
            per_layer = self._avg_batch(self._weights, images)
            for name, v in per_layer.items():
                enc[name] = running_mean(enc.get(name), v["enc"], n, b)
                err[name] = running_mean(err.get(name), v["err"], n, b)
                out[name] = running_mean(out.get(name), v["out"], n, b)
                dead[name] = (
                    v["dead"] if name not in dead else jnp.logical_and(dead[name], v["dead"])
                )
                spars[name] = running_mean(spars.get(name), v["sparsity"], n, b)
            n += b
        return Averages(enc, err, out, dead, spars)

    # -- 2) node IE (reference compute_node_ie, compute_ie.py:365-472) -------------

    @functools.cached_property
    def _node_batch(self):
        @jax.jit
        def f(weights, images, labels, enc_avg, err_avg, out_avg):
            params, state, sae_p = weights
            _, taps, grads = loss_and_tap_grads(
                self.net, params, state, images, labels,
                self.criterion, self.layers,
            )
            res = {}
            for name in self.layers:
                act, grad = taps[name], grads[name]
                b = act.shape[0]
                tok, _ = tokens_from_act(act)
                gtok, _ = tokens_from_act(grad)
                enc = self._enc(name, sae_p[name], tok)
                # pass-through + stop-gradient semantics make the encoder-output
                # gradient = clean layer gradient chained through the decoder
                # (compute_ie.py:242-267; equivalence test in tests/test_patching.py)
                dec, vjp_dec = jax.vjp(
                    lambda e: self._dec(name, sae_p[name], e), enc)
                (enc_grad,) = vjp_dec(gtok)
                err = tok - dec
                res[name] = {
                    "features": ie_channel_wise(enc, enc_avg[name], enc_grad, b),
                    "error": ie_all_channels(err, err_avg[name], gtok, b),
                    "model_neurons": ie_channel_wise(tok, out_avg[name], gtok, b),
                }
            return res

        return f

    def compute_node_ie(self, data: Iterable, averages: Averages) -> NodeIE:
        feats, errs, neurons = {}, {}, {}
        n = 0
        for images, labels in data:
            b = images.shape[0]
            res = self._node_batch(self._weights, images, labels,
                                   averages.enc, averages.err, averages.out)
            for name, v in res.items():
                feats[name] = running_mean(feats.get(name), v["features"], n, b)
                errs[name] = running_mean(errs.get(name), v["error"], n, b)
                neurons[name] = running_mean(neurons.get(name), v["model_neurons"], n, b)
            n += b
        return NodeIE(feats, errs, neurons)

    # -- 3) edge IE (reference compute_edge_ie, compute_ie.py:476-711) -------------

    def _make_edge_pair_fn(self, name_u: str, name_d: str, idx_u: tuple, idx_d: tuple,
                           cotangent_chunk: int = 64):
        """Edge IE contribution of one batch for the consecutive pair (u, d).

        Returns [len(idx_u)+1, len(idx_d)+1]: rows = upstream SAE features + upstream
        SAE error node; columns = downstream SAE features + downstream SAE error node
        (the reference's ie_vals_dict[name_u] layout, compute_ie.py:511-514).

        The reference backprops ``prod_j = mean(grad_m_d[:, j] * enc_d[:, j])`` once per
        downstream feature with retain_graph (compute_ie.py:589-624). Here all prods are
        one vector-valued function; a vmapped one-hot cotangent stack over its vjp gives
        every ∂prod_j/∂(enc_u, dec_u) in a single XLA computation.
        """
        idx_u_arr = jnp.asarray(idx_u, jnp.int32)
        idx_d_arr = jnp.asarray(idx_d, jnp.int32)

        @jax.jit
        def f(weights, act_u, act_d, grad_d, enc_avg_u, err_avg_u):
            params, state, sae_p = weights
            # clean taps/gradients come from ONE shared multi-tap backward per batch
            # (compute_edge_ie below); this function only retraces the u->d segment
            b = act_u.shape[0]
            gd_tok, _ = tokens_from_act(grad_d)
            gd_tok = jax.lax.stop_gradient(gd_tok)

            # grad of loss w.r.t. enc_d under the standard intervention at d
            # (first trace of the reference pair loop, compute_ie.py:552-558)
            tok_d0, _ = tokens_from_act(act_d)
            enc_d0 = self._enc(name_d, sae_p[name_d], tok_d0)
            _, vjp_dec_d = jax.vjp(
                lambda e: self._dec(name_d, sae_p[name_d], e), enc_d0)
            (grad_m_d,) = vjp_dec_d(gd_tok)
            grad_m_d = jax.lax.stop_gradient(grad_m_d)

            tok_u, transformed_u = tokens_from_act(act_u)
            enc_u0 = self._enc(name_u, sae_p[name_u], tok_u)
            dec_u0 = self._dec(name_u, sae_p[name_u], enc_u0)
            err_u = tok_u - dec_u0

            def prods_fn(eps_enc, eps_dec):
                # upstream intervention: stop-grad on SAE error, no pass-through
                # (compute_ie.py:572-573); eps injections expose the encoder/decoder
                # outputs as differentiable leaves
                enc_u = enc_u0 + eps_enc
                dec_u = self._dec(name_u, sae_p[name_u], enc_u) + eps_dec
                spliced = splice_with_error(tok_u, dec_u)
                act_sp = act_from_tokens(spliced, act_u.shape) if transformed_u else spliced
                act_d2 = self.net.apply_segment(
                    params, act_sp, after=name_u, upto=name_d, state=state
                )
                tok_d, _ = tokens_from_act(act_d2)
                # downstream: no stop-grad, no pass-through (compute_ie.py:580-581)
                enc_d = self._enc(name_d, sae_p[name_d], tok_d)
                dec_d = self._dec(name_d, sae_p[name_d], enc_d)
                err_d = tok_d - dec_d
                pf = jnp.mean(grad_m_d * enc_d, axis=0)[idx_d_arr]  # [D_sel]
                pe = jnp.mean(jnp.sum(gd_tok * err_d, axis=-1))  # scalar
                return jnp.concatenate([pf, pe[None]])

            zeros_e = jnp.zeros_like(enc_u0)
            zeros_d = jnp.zeros_like(tok_u)
            _, vjp_fn = jax.vjp(prods_fn, zeros_e, zeros_d)
            n_out = len(idx_d) + 1
            eye = jnp.eye(n_out, dtype=enc_u0.dtype)

            enc_u_sel = enc_u0[:, idx_u_arr]
            enc_avg_u_sel = enc_avg_u[..., idx_u_arr]

            def col(g_e, g_d):
                fe = ie_channel_wise(enc_u_sel, enc_avg_u_sel, g_e[:, idx_u_arr], b)
                er = ie_all_channels(err_u, err_avg_u, g_d, b)
                return jnp.concatenate([fe, er[None]])

            def apply_cts(cts):  # [k, n_out] cotangents -> [k, U_sel+1] columns
                g_enc, g_dec = jax.vmap(lambda ct: vjp_fn(ct))(cts)
                return jax.vmap(col)(g_enc, g_dec)

            if n_out <= cotangent_chunk:
                cols = apply_cts(eye)
            else:
                # feature-chunked cotangents (SURVEY §7.3 #2): a [n_out, T, C*K]
                # cotangent stack for thousands of features won't fit HBM; lax.map
                # over chunks bounds the live set to chunk-size backward passes.
                # The IE reduction to [U_sel+1] columns happens INSIDE the chunk
                # body — accumulating the raw [n_out, T, C*K] gradient stack across
                # chunks would itself overflow HBM at production feature counts
                # (257 x 6272 x 2048 f32 = 13 GB for one mixed3a batch of 8).
                pad = (-n_out) % cotangent_chunk
                eye_p = jnp.pad(eye, ((0, pad), (0, 0)))
                chunks = eye_p.reshape(-1, cotangent_chunk, n_out)
                cols = jax.lax.map(apply_cts, chunks)
                cols = cols.reshape(-1, len(idx_u) + 1)[:n_out]
            return cols.T

        return f

    def _make_edge_loss_fn(self, name_u: str, idx_u: tuple):
        """Edges from the model-loss node to the LAST layer's features/error
        (compute_ie.py:669-705): grad_m_d is identically 1, so the edge gradient is the
        loss gradient w.r.t. the upstream encoder/decoder outputs under the standard
        upstream intervention (stop-grad, no pass-through)."""
        idx_u_arr = jnp.asarray(idx_u, jnp.int32)

        @jax.jit
        def f(weights, images, labels, enc_avg_u, err_avg_u):
            params, state, sae_p = weights
            _, taps, _ = self.net.apply(params, images, state=state)
            act_u = taps[name_u]
            b = act_u.shape[0]
            tok_u, transformed_u = tokens_from_act(act_u)
            enc_u0 = self._enc(name_u, sae_p[name_u], tok_u)
            err_u = tok_u - self._dec(name_u, sae_p[name_u], enc_u0)

            def loss_fn(eps_enc, eps_dec):
                def sp(a):
                    tok, tr = tokens_from_act(a)
                    enc = self._enc(name_u, sae_p[name_u], tok) + eps_enc
                    dec = self._dec(name_u, sae_p[name_u], enc) + eps_dec
                    out = splice_with_error(tok, dec)
                    return act_from_tokens(out, a.shape) if tr else out

                logits, _, _ = self.net.apply(
                    params, images, state=state, splice={name_u: sp}
                )
                return self.criterion(logits, labels)

            g_enc, g_dec = jax.grad(loss_fn, argnums=(0, 1))(
                jnp.zeros_like(enc_u0), jnp.zeros_like(tok_u)
            )
            fe = ie_channel_wise(enc_u0[:, idx_u_arr], enc_avg_u[..., idx_u_arr],
                                 g_enc[:, idx_u_arr], b)
            er = ie_all_channels(err_u, err_avg_u, g_dec, b)
            return jnp.concatenate([fe, er[None]])[:, None]  # [U_sel+1, 1]

        return f

    def compute_edge_ie(
        self,
        data: Iterable,
        averages: Averages,
        feature_indices: dict[str, Sequence[int]],
        custom_layers: Optional[Sequence[str]] = None,
        cotangent_chunk: int = 64,
    ) -> dict[str, jax.Array]:
        """Edge IE matrices per upstream layer over consecutive pairs of
        ``custom_layers`` (compute_ie.py:491-514); the last layer's downstream node is
        the model loss. Batches weighted equally (reference update_ie_dict uses
        batch_idx, compute_ie.py:357-360).

        One shared clean forward+multi-tap-backward per batch feeds every pair
        (the reference reruns get_grad_original and a trace per pair,
        compute_ie.py:537-558)."""
        layers = list(custom_layers) if custom_layers is not None else self.layers
        pair_fns = {}
        for u, d in zip(layers[:-1], layers[1:]):
            pair_fns[u] = self._make_edge_pair_fn(
                u, d, tuple(feature_indices[u]), tuple(feature_indices[d]),
                cotangent_chunk=cotangent_chunk,
            )
        last = layers[-1]
        last_fn = self._make_edge_loss_fn(last, tuple(feature_indices[last]))

        @jax.jit
        def clean(weights, images, labels):
            params, state, _ = weights
            _, taps, grads = loss_and_tap_grads(
                self.net, params, state, images, labels,
                self.criterion, layers,
            )
            return taps, grads

        edges: dict[str, jax.Array] = {}
        batch_idx = 0
        for images, labels in data:
            batch_idx += 1
            taps, grads = clean(self._weights, images, labels)
            for u, d in zip(layers[:-1], layers[1:]):
                mat = pair_fns[u](
                    self._weights, taps[u], taps[d], grads[d],
                    averages.enc[u], averages.err[u]
                )
                edges[u] = running_mean(edges.get(u), mat, batch_idx - 1, 1)
            mat = last_fn(self._weights, images, labels,
                          averages.enc[last], averages.err[last])
            edges[last] = running_mean(edges.get(last), mat, batch_idx - 1, 1)
        return edges

    # -- 4) faithfulness (reference compute_faithfulness, compute_ie.py:715-944) ---

    def circuit_masks(self, node_ie: NodeIE, feature_threshold: float,
                      error_threshold: Optional[float] = None) -> tuple[dict, dict, dict]:
        """Boolean node filters: |IE| > threshold (compute_ie.py:730-733; the error
        threshold defaults to the feature threshold, :722)."""
        error_threshold = feature_threshold if error_threshold is None else error_threshold
        feat = {n: jnp.abs(node_ie.features[n]) > feature_threshold for n in self.layers}
        err = {n: jnp.abs(node_ie.error[n]) > error_threshold for n in self.layers}
        neurons = {n: jnp.abs(node_ie.model_neurons[n]) > feature_threshold
                   for n in self.layers}
        return feat, err, neurons

    def _sae_splice(self, name, sae_params, mask, enc_avg, err_avg, variant: str,
                    err_keep=None):
        """One layer's faithfulness intervention (reference apply_sae + error handling,
        utils.py:2786-2820, compute_ie.py:797-862). Variants:
          zero:    circuit features, SAE error zero-ablated
          mean:    circuit features, SAE error mean-ablated
          circuit: circuit features, SAE error kept iff its node is in the circuit
                   (error computed from the ORIGINAL decoder output, compute_ie.py:842-848)
        """

        def sp(act):
            tok, tr = tokens_from_act(act)
            b = act.shape[0]
            enc = self._enc(name, sae_params, tok)
            avg_tok = broadcast_average(enc_avg, b)
            new_enc = jnp.where(mask[None, :], enc, avg_tok)
            new_dec = self._dec(name, sae_params, new_enc)
            if variant == "zero":
                out = new_dec
            elif variant == "mean":
                out = new_dec + broadcast_average(err_avg, b)
            elif variant == "circuit":
                dec = self._dec(name, sae_params, enc)
                err = tok - dec
                err_mean = broadcast_average(err_avg, b) * jnp.ones_like(err)
                out = new_dec + jnp.where(err_keep, err, err_mean)
            else:
                raise ValueError(variant)
            return act_from_tokens(out, act.shape) if tr else out

        return sp

    @functools.cached_property
    def _faithfulness_batch(self):
        @jax.jit
        def f(weights, images, labels, feat_masks, err_keep, enc_avg, err_avg):
            params, state, sae_p = weights

            def run(variant, masks, keep=None):
                splice = {
                    name: self._sae_splice(
                        name, sae_p[name], masks[name], enc_avg[name],
                        err_avg[name], variant,
                        None if keep is None else keep[name],
                    )
                    for name in self.layers
                }
                logits, _, _ = self.net.apply(
                    params, images, state=state, splice=splice
                )
                return self.criterion(logits, labels)

            empty_masks = {n: jnp.zeros_like(feat_masks[n]) for n in self.layers}
            logits_full, _, _ = self.net.apply(params, images, state=state)
            return {
                "m_C_zero": run("zero", feat_masks),
                "m_C_mean": run("mean", feat_masks),
                "m_C": run("circuit", feat_masks, err_keep),
                "m_empty": run("mean", empty_masks),
                "m_M": self.criterion(logits_full, labels),
            }

        return f

    @functools.cached_property
    def _faithfulness_model_batch(self):
        """Model-neuron circuit variant (compute_ie.py:864-883): mean-ablate raw
        channels below threshold."""

        @jax.jit
        def f(weights, images, labels, neuron_masks, out_avg):
            params, state, _ = weights

            def make_sp(name, mask):
                def sp(act):
                    tok, tr = tokens_from_act(act)
                    avg_tok = broadcast_average(out_avg[name], act.shape[0])
                    out = jnp.where(mask[None, :], tok, avg_tok)
                    return act_from_tokens(out, act.shape) if tr else out

                return sp

            def run(masks):
                splice = {n: make_sp(n, masks[n]) for n in self.layers}
                logits, _, _ = self.net.apply(
                    params, images, state=state, splice=splice
                )
                return self.criterion(logits, labels)

            empty = {n: jnp.zeros_like(neuron_masks[n]) for n in self.layers}
            logits_full, _, _ = self.net.apply(params, images, state=state)
            return {
                "m_C": run(neuron_masks),
                "m_empty": run(empty),
                "m_M": self.criterion(logits_full, labels),
            }

        return f

    def compute_faithfulness(
        self,
        data: Iterable,
        node_ie: NodeIE,
        feature_threshold: float,
        error_threshold: Optional[float] = None,
        model_or_sae: str = "sae",
        averages: Optional[Averages] = None,
    ) -> dict:
        """Faithfulness = (m(C) - m(empty)) / (m(M) - m(empty)) with zero-/mean-/
        original-error circuit variants (compute_ie.py:715-944). Batch losses averaged
        with equal batch weight (compute_ie.py:889-902)."""
        assert averages is not None, "faithfulness needs dataset averages"
        feat_masks, err_keep, neuron_masks = self.circuit_masks(
            node_ie, feature_threshold, error_threshold
        )
        acc: dict[str, jax.Array] = {}
        batch_idx = 0
        for images, labels in data:
            batch_idx += 1
            if model_or_sae == "sae":
                m = self._faithfulness_batch(
                    self._weights, images, labels, feat_masks, err_keep,
                    averages.enc, averages.err
                )
            else:
                m = self._faithfulness_model_batch(
                    self._weights, images, labels, neuron_masks, averages.out
                )
            for k, v in m.items():
                acc[k] = running_mean(acc.get(k), v, batch_idx - 1, 1)

        denom = acc["m_M"] - acc["m_empty"]
        result = {
            "feature_node_threshold": float(feature_threshold),
            "error_node_threshold": float(
                feature_threshold if error_threshold is None else error_threshold
            ),
            "faithfulness": float((acc["m_C"] - acc["m_empty"]) / denom),
            "m_C": float(acc["m_C"]),
            "m_empty": float(acc["m_empty"]),
            "m_M": float(acc["m_M"]),
        }
        if model_or_sae == "sae":
            result["faithfulness_sae_errors_zero_ablated"] = float(
                (acc["m_C_zero"] - acc["m_empty"]) / denom
            )
            result["faithfulness_sae_errors_mean_ablated"] = float(
                (acc["m_C_mean"] - acc["m_empty"]) / denom
            )
            result["num_feature_nodes"] = {
                n: int(jnp.sum(feat_masks[n])) for n in self.layers
            }
            result["num_error_nodes"] = int(
                sum(bool(err_keep[n]) for n in self.layers)
            )
        return result

"""Import — and export — the reference's torch ``.tar`` checkpoint format.

The reference saves ``{global_step, network_fn_state_dict,
network_fine_state_dict, optimizer_state_dict}`` (run_nerf.py:794-800) and
resumes by loading the newest tar (run_nerf.py:216-233). A user migrating
from nerf-pytorch has trained models in exactly that format; this module
maps them onto this framework's pytrees so ``--ft_path ckpt.tar`` resumes a
reference run natively — parameters, Adam moments, AND the step counter
(so the exponential LR schedule continues where the torch run left off).

Layout mapping (run_nerf_helpers.py:67-94 registration order):
- ``pts_linears.{i}.weight`` [out, in] -> ``trunk[i].w`` [in, out] (transposed:
  this framework stores row-major MXU layout so application is ``x @ w``);
- viewdirs heads ``feature_linear / alpha_linear / views_linears.0 /
  rgb_linear`` -> ``feature / alpha / views / rgb``;
- no-viewdirs ``output_linear`` -> ``output``.

Adam moments: torch's per-param ``exp_avg / exp_avg_sq`` (in
``grad_vars = list(model.parameters()) + list(model_fine.parameters())``
order, run_nerf.py:192-199) map onto optax's ``mu / nu`` with the same
transpose as the weights; the bias-correction counters align because both
count completed updates. Moments missing from the tar (a pre-first-update
save) fall back to optax's zero init.

torch is imported lazily and only needed to read the tar; the mapping
itself is plain numpy.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.models.nerf_mlp import MLPConfig, Params


def _np(t) -> np.ndarray:
    """torch tensor (cpu) or array-like -> float32 numpy array."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    # always copy: torch.load can alias storages across state_dict entries,
    # and the donated train step forbids two arguments sharing one buffer
    return np.array(t, np.float32)


def params_from_torch_state_dict(sd: Mapping, cfg: MLPConfig) -> Params:
    """Map one reference ``NeRF.state_dict()`` onto this framework's Params."""

    def lin(prefix: str, fan_in: int, fan_out: int) -> Dict[str, np.ndarray]:
        w = _np(sd[f"{prefix}.weight"])
        b = _np(sd[f"{prefix}.bias"]).reshape(-1)
        if w.shape != (fan_out, fan_in):
            raise ValueError(
                f"{prefix}.weight has shape {w.shape}, expected "
                f"({fan_out}, {fan_in}) for the configured model "
                f"(depth={cfg.depth}, width={cfg.width}, "
                f"input_ch={cfg.input_ch}, input_ch_views={cfg.input_ch_views})"
            )
        return {"w": np.ascontiguousarray(w.T), "b": b}

    params: Params = {"trunk": []}
    fan_in = cfg.input_ch
    for i in range(cfg.depth):
        params["trunk"].append(lin(f"pts_linears.{i}", fan_in, cfg.width))
        fan_in = cfg.width + (cfg.input_ch if i in cfg.skips else 0)
    if cfg.use_viewdirs:
        params["alpha"] = lin("alpha_linear", cfg.width, 1)
        params["feature"] = lin("feature_linear", cfg.width, cfg.width)
        params["views"] = lin(
            "views_linears.0", cfg.width + cfg.input_ch_views, cfg.width // 2
        )
        params["rgb"] = lin("rgb_linear", cfg.width // 2, 3)
    else:
        params["output"] = lin("output_linear", cfg.width, cfg.output_ch)
    return params


def _moment_state_dicts(opt_sd: Mapping, sd: Mapping, offset: int):
    """Rebuild {param_name: exp_avg / exp_avg_sq} for one network.

    torch's optimizer state is keyed by position in the param-group list;
    for a buffer-free module, ``state_dict()`` iterates parameters in the
    same registration order as ``model.parameters()``, so position
    ``offset + i`` is the i-th state_dict entry.

    Parameters with no optimizer entry get zero moments: torch Adam only
    materializes state for params that have received gradients, and the
    reference registers heads its forward never uses (``views_linears``
    when ``use_viewdirs=False``, run_nerf_helpers.py:83), so a real
    reference tar legitimately lacks moments for them — and zeros are
    exactly what a continued run would have. Returns (mu_sd, nu_sd,
    n_steps) — or (None, None, None) when NO parameter has state (a
    pre-first-update torch save).
    """
    state = opt_sd.get("state", {})
    mu_sd, nu_sd, steps = {}, {}, []
    found = 0
    for i, name in enumerate(sd.keys()):
        ps = state.get(offset + i)
        if ps is None or "exp_avg" not in ps:
            z = np.zeros_like(_np(sd[name]))
            mu_sd[name], nu_sd[name] = z, z.copy()
            continue
        found += 1
        mu_sd[name] = ps["exp_avg"]
        nu_sd[name] = ps["exp_avg_sq"]
        steps.append(int(_np(ps.get("step", 0)).reshape(())))
    if found == 0:
        return None, None, None
    return mu_sd, nu_sd, max(steps) if steps else 0


def state_dict_from_params(params: Params, cfg: MLPConfig) -> Dict:
    """Inverse mapping: this framework's Params -> a reference-layout
    state_dict (plain numpy, [out, in] weights) — the exact key set
    ``NeRF.state_dict()`` produces, so torch tooling built on the reference
    (viewers, mesh extractors, further torch training) consumes it."""
    sd: Dict = {}

    def put(prefix: str, p):
        # np.array (not ascontiguousarray): always a fresh WRITABLE copy —
        # jax.device_get hands back read-only buffers, and a [1, W] transpose
        # is already contiguous so ascontiguousarray would pass the read-only
        # view through to torch.from_numpy
        sd[f"{prefix}.weight"] = np.array(np.asarray(p["w"]).T, np.float32)
        sd[f"{prefix}.bias"] = np.array(p["b"], np.float32)

    for i in range(cfg.depth):
        put(f"pts_linears.{i}", params["trunk"][i])
    if cfg.use_viewdirs:
        put("views_linears.0", params["views"])
        put("feature_linear", params["feature"])
        put("alpha_linear", params["alpha"])
        put("rgb_linear", params["rgb"])
    else:
        put("output_linear", params["output"])
    return sd


def export_torch_checkpoint(path: str, state, model) -> str:
    """Write a TrainState as a reference-format ``.tar`` (run_nerf.py:794-800).

    Inverse of :func:`train_state_from_torch_checkpoint`: network weights,
    Adam moments (exp_avg/exp_avg_sq at the optax counts), and global_step,
    loadable by the stock reference's resume (run_nerf.py:216-233). A TPU
    training run therefore has no lock-in — hand the tar back to any
    torch-based downstream tooling.
    """
    import torch  # lazy

    params = jax.device_get(state.params)
    sd_c = state_dict_from_params(params["coarse"], model.coarse)
    out = {
        "global_step": int(state.step),
        "network_fn_state_dict": {k: torch.from_numpy(v) for k, v in sd_c.items()},
        "optimizer_state_dict": {"state": {}, "param_groups": []},
    }
    sds = [sd_c]
    if "fine" in params:
        sd_f = state_dict_from_params(params["fine"], model.fine)
        out["network_fine_state_dict"] = {
            k: torch.from_numpy(v) for k, v in sd_f.items()
        }
        sds.append(sd_f)

    adam, _sched = state.opt_state
    mu, nu = jax.device_get((adam.mu, adam.nu))
    count = int(adam.count)
    opt_state: Dict = {}
    idx = 0
    for lvl, sd in zip(("coarse", "fine"), sds):
        lvl_cfg = model.fine if lvl == "fine" else model.coarse
        mu_sd = state_dict_from_params(mu[lvl], lvl_cfg)
        nu_sd = state_dict_from_params(nu[lvl], lvl_cfg)
        for name in sd:
            opt_state[idx] = {
                "step": torch.tensor(float(count)),
                "exp_avg": torch.from_numpy(mu_sd[name]),
                "exp_avg_sq": torch.from_numpy(nu_sd[name]),
            }
            idx += 1
    out["optimizer_state_dict"] = {
        "state": opt_state,
        "param_groups": [
            {
                "lr": 0.0,  # the reference overwrites lr every step
                "betas": (0.9, 0.999),
                "eps": 1e-8,
                "weight_decay": 0,
                "amsgrad": False,
                "params": list(range(idx)),
            }
        ],
    }
    torch.save(out, path)
    return path


def load_torch_checkpoint(path: str, model) -> Dict:
    """Read a reference ``.tar`` into {params, mu, nu, step, opt_step}.

    ``model`` is a ``NeRFModel``; its coarse/fine MLPConfigs drive the
    name mapping and shape validation. ``mu``/``nu`` are None when the tar
    holds no usable optimizer moments. ``opt_step`` is torch Adam's own
    update counter (equals ``global_step`` in any real reference run).
    """
    import torch  # lazy: only the tar reader needs it

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    step = int(ckpt["global_step"])

    sd_c = ckpt["network_fn_state_dict"]
    params: Dict = {"coarse": params_from_torch_state_dict(sd_c, model.coarse)}
    sd_f = ckpt.get("network_fine_state_dict")
    if model.fine is not None:
        if sd_f is None:
            raise ValueError(
                f"{path} has no network_fine_state_dict but the configured "
                "model has a fine network (N_importance > 0)"
            )
        params["fine"] = params_from_torch_state_dict(sd_f, model.fine)

    mu = nu = None
    opt_step = step
    opt_sd = ckpt.get("optimizer_state_dict")
    if opt_sd is not None:
        mu_c, nu_c, st_c = _moment_state_dicts(opt_sd, sd_c, 0)
        if mu_c is not None:
            mu = {"coarse": params_from_torch_state_dict(mu_c, model.coarse)}
            nu = {"coarse": params_from_torch_state_dict(nu_c, model.coarse)}
            opt_step = st_c
            if model.fine is not None:
                mu_f, nu_f, st_f = _moment_state_dicts(opt_sd, sd_f, len(sd_c))
                if mu_f is None:
                    mu = nu = None  # partial moments: fall back whole
                else:
                    mu["fine"] = params_from_torch_state_dict(mu_f, model.fine)
                    nu["fine"] = params_from_torch_state_dict(nu_f, model.fine)
                    opt_step = max(st_c, st_f)
    return {"params": params, "mu": mu, "nu": nu, "step": step, "opt_step": opt_step}


def train_state_from_torch_checkpoint(
    path: str, model, lrate: float, lrate_decay: int
):
    """Build a resumable TrainState from a reference ``.tar``.

    The optax chain is ``(scale_by_adam, scale_by_schedule)``; both counts
    are set to the torch optimizer's completed-update count so bias
    correction and the LR schedule continue exactly where the reference
    run stopped (ref resume: run_nerf.py:227-233 + the per-step decay at
    run_nerf.py:780-784).
    """
    from nerf_tpu.train.step import TrainState, make_optimizer  # lazy: no cycle

    loaded = load_torch_checkpoint(path, model)
    params = jax.tree.map(jnp.asarray, loaded["params"])
    tx = make_optimizer(lrate, lrate_decay)
    opt_state = tx.init(params)
    if loaded["mu"] is not None:
        adam, sched = opt_state
        # two distinct count arrays: the donated train step forbids one
        # buffer appearing as two arguments
        adam = adam._replace(
            count=jnp.asarray(loaded["opt_step"], jnp.int32),
            mu=jax.tree.map(jnp.asarray, loaded["mu"]),
            nu=jax.tree.map(jnp.asarray, loaded["nu"]),
        )
        sched = sched._replace(count=jnp.asarray(loaded["opt_step"], jnp.int32))
        opt_state = (adam, sched)
    return TrainState(
        params=params,
        opt_state=opt_state,
        step=jnp.asarray(loaded["step"], jnp.int32),
    )

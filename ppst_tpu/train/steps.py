"""Jitted training steps: the reference's D/G alternation as pure
functions (reference optimizers/ppst_optimizer.py:65-130).

Design (SURVEY.md 7.1): one train step = one jit. The D step, the D step
with lazy R1, and the G step are three separately-jitted pure functions
over (params, state, opt_states, batch, rng); the host loop alternates
them. Gradients are taken only w.r.t. the updated subtree, so XLA prunes
the unused backward paths (the reference gets this from requires_grad
toggling, :50-55, :74-77, :99-102).

Under a device mesh the same functions are jitted with the batch sharded
over the 'data' axis and params/opt-states replicated; the mean-loss
gradients then all-reduce automatically (DDP-equivalent), and the RSCL
queue update consumes the globally-visible batch exactly like the
reference's concat_all_gather (losses.enqueue_schedule).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax

from ppst_tpu.models.config import PPSTConfig
from ppst_tpu.models.ppst import PPSTModel

GE_KEYS = ("G", "E1", "E2")


def make_optimizers(cfg: PPSTConfig) -> Dict[str, optax.GradientTransformation]:
    """Four Adam optimizers; D uses the lazy-R1 hyperparameter
    compensation c = R1_once_every / (1 + R1_once_every)
    (reference ppst_optimizer.py:36-49)."""
    adam = lambda lr, b1, b2: optax.adam(lr, b1=b1, b2=b2, eps=1e-8)
    c = cfg.R1_once_every / (1 + cfg.R1_once_every)
    return {
        "G": adam(cfg.lr, cfg.beta1, cfg.beta2),
        "E1": adam(cfg.lr, cfg.beta1, cfg.beta2),
        "E2": adam(cfg.lr, cfg.beta1, cfg.beta2),
        "D": adam(cfg.lr * c, cfg.beta1**c, cfg.beta2**c),
    }


def build_train_steps(
    model: PPSTModel,
    n_dev: int = 1,
    mesh=None,
    donate: bool = True,
):
    """Returns (init_opt_states, d_step, d_step_r1, g_step).

    Each step maps (params, state, opt_states, real, mask, rng) ->
    (params, state, opt_states, losses) with losses a dict of scalars.
    """
    cfg = model.cfg
    opts = make_optimizers(cfg)
    import jax.numpy as jnp

    compute_dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

    def cast_batch(real, mask):
        """Compute dtype is driven by the input dtype throughout the
        model stack (weights cast to x.dtype at use); params, optimizer
        state, and loss reductions stay float32."""
        return real.astype(compute_dt), mask.astype(compute_dt)

    def init_opt_states(params):
        return {k: opts[k].init(params[k]) for k in opts}

    # -- D ---------------------------------------------------------------

    def _d_update(params, state, opt_states, real, mask, rng):
        def loss_fn(d_params):
            p = dict(params, D=d_params)
            losses, new_state = model.discriminator_losses(
                p, state, real, mask, rng, n_dev=n_dev
            )
            return sum(losses.values()), (losses, new_state)

        grads, (losses, new_state) = jax.grad(loss_fn, has_aux=True)(params["D"])
        updates, new_opt_d = opts["D"].update(grads, opt_states["D"], params["D"])
        params = dict(params, D=optax.apply_updates(params["D"], updates))
        opt_states = dict(opt_states, D=new_opt_d)
        return params, new_state, opt_states, losses

    def d_step(params, state, opt_states, real, mask, rng):
        real, mask = cast_batch(real, mask)
        params, state, opt_states, losses = _d_update(
            params, state, opt_states, real, mask, rng
        )
        losses["D_total"] = sum(losses.values())
        return params, state, opt_states, losses

    def d_step_r1(params, state, opt_states, real, mask, rng):
        """D update followed by a separate lazy-R1 update on the freshly
        updated D (the reference runs two optimizer_D.step()s,
        ppst_optimizer.py:113-126), with the x R1_once_every scaling."""
        real, mask = cast_batch(real, mask)
        params, state, opt_states, losses = _d_update(
            params, state, opt_states, real, mask, rng
        )

        def r1_fn(d_params):
            p = dict(params, D=d_params)
            r1 = model.r1_loss(p, real)
            return sum(r1.values()) * cfg.R1_once_every, r1

        grads, r1_losses = jax.grad(r1_fn, has_aux=True)(params["D"])
        updates, new_opt_d = opts["D"].update(grads, opt_states["D"], params["D"])
        params = dict(params, D=optax.apply_updates(params["D"], updates))
        opt_states = dict(opt_states, D=new_opt_d)
        losses = dict(losses, **r1_losses)
        losses["D_total"] = sum(losses.values())
        return params, state, opt_states, losses

    # -- G ---------------------------------------------------------------

    def g_step(params, state, opt_states, real, mask, rng):
        real, mask = cast_batch(real, mask)

        def loss_fn(ge_params):
            p = dict(ge_params, D=params["D"])
            losses, metrics, new_state = model.generator_losses(
                p, state, real, mask, rng, n_dev=n_dev
            )
            return sum(losses.values()), (losses, metrics, new_state)

        ge = {k: params[k] for k in GE_KEYS}
        grads, (losses, metrics, new_state) = jax.grad(loss_fn, has_aux=True)(ge)
        new_params = dict(params)
        new_opt_states = dict(opt_states)
        for k in GE_KEYS:
            updates, new_opt_states[k] = opts[k].update(
                grads[k], opt_states[k], params[k]
            )
            new_params[k] = optax.apply_updates(params[k], updates)
        losses = dict(losses, **metrics)
        return new_params, new_state, new_opt_states, losses

    jit_kwargs: Dict[str, Any] = {}
    if donate:
        jit_kwargs["donate_argnums"] = (0, 1, 2)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        batch_sh = NamedSharding(mesh, P("data"))
        jit_kwargs["in_shardings"] = (repl, repl, repl, batch_sh, batch_sh, repl)
        jit_kwargs["out_shardings"] = (repl, repl, repl, repl)

    return (
        init_opt_states,
        jax.jit(d_step, **jit_kwargs),
        jax.jit(d_step_r1, **jit_kwargs),
        jax.jit(g_step, **jit_kwargs),
    )

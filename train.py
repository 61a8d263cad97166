"""Training entry point (reference train.py, minus the
CUDA_LAUNCH_BLOCKING debugging leftover that serialized its kernels)."""

import ppst_tpu.data as data
import ppst_tpu.optimizers as optimizers
from ppst_tpu.evaluation import GroupEvaluator
from ppst_tpu.options import TrainOptions
from ppst_tpu.train import create_model
from ppst_tpu.util import IterationCounter, MetricTracker, Visualizer


def main():
    import os

    # Multi-host: rendezvous BEFORE any JAX backend touch (the TPU-native
    # analog of torch.distributed.launch's env:// NCCL rendezvous,
    # reference models/__init__.py:78-83 + tmux_launcher.py:86-90). On
    # real TPU pods jax.distributed.initialize() auto-detects from the
    # TPU environment; the explicit envs drive CPU/loopback meshes
    # (tools/multihost_cli_smoke.py).
    if os.environ.get("PPST_PLATFORM"):
        # the axon TPU plugin ignores the JAX_PLATFORMS env var; the
        # config knob wins (used by tools/multihost_cli_smoke.py to pin
        # the virtual CPU mesh)
        import jax

        jax.config.update("jax_platforms", os.environ["PPST_PLATFORM"])
    if os.environ.get("PPST_NUM_PROCESSES"):
        import jax

        jax.distributed.initialize(
            coordinator_address=os.environ["PPST_COORDINATOR"],
            num_processes=int(os.environ["PPST_NUM_PROCESSES"]),
            process_id=int(os.environ["PPST_PROCESS_ID"]),
        )
        # (the Gloo collective context is warmed clique-exactly inside
        # parallel.mesh.make_mesh — see _warmup_collectives)

    from ppst_tpu.util.cache import setup_compile_cache

    setup_compile_cache()
    opt = TrainOptions().parse()
    model = create_model(opt)
    dataset = data.create_dataset(opt)
    iter_counter = IterationCounter(opt)
    visualizer = Visualizer(opt)
    metric_tracker = MetricTracker(opt)
    evaluators = GroupEvaluator(opt)
    optimizer = optimizers.create_optimizer(opt, model)

    # graceful shutdown: SIGTERM/SIGINT save a checkpoint before exiting
    # (the reference's only recovery story is manual --continue_train;
    # saves here are atomic so a kill mid-save cannot corrupt state)
    import signal

    def _save_and_exit(signum, frame):
        print(f"signal {signum}: saving checkpoint before exit")
        optimizer.save(iter_counter.steps_so_far)
        raise SystemExit(0)

    signal.signal(signal.SIGTERM, _save_and_exit)
    signal.signal(signal.SIGINT, _save_and_exit)

    profiling = False
    step_idx = 0
    while not iter_counter.completed_training():
        if opt.profile_dir:
            # jax.profiler trace of a steady-state window (SURVEY.md 5.1)
            if step_idx == 10 and not profiling:
                import jax

                jax.profiler.start_trace(opt.profile_dir)
                profiling = True
            elif step_idx == 15 and profiling:
                import jax

                jax.profiler.stop_trace()
                profiling = False

        with iter_counter.time_measurement("data"):
            cur_data = next(dataset)

        with iter_counter.time_measurement("train"):
            losses = optimizer.train_one_step(cur_data, iter_counter.steps_so_far)
            metric_tracker.update_metrics(losses, smoothe=True)
        step_idx += 1

        # rank-0 gating (reference train.py:32-55): losses were already
        # fetched on every process (the jitted steps are SPMD), but file/
        # console output belongs to process 0 alone
        import jax as _jax

        primary = _jax.process_index() == 0

        with iter_counter.time_measurement("maintenance"):
            if iter_counter.needs_printing() and primary:
                visualizer.print_current_losses(
                    iter_counter.steps_so_far,
                    iter_counter.time_measurements,
                    metric_tracker.current_metrics(),
                )
            if (iter_counter.needs_displaying() and primary
                    and _jax.process_count() == 1):
                # snapshot_core is a single-host jit; see the eval note
                # periodic snapshot grid (the reference ships this hook
                # commented out; here it saves real/layout/rec/mix rows)
                import numpy as np

                from ppst_tpu.util.util import save_image, tensor2im, tile_images

                visuals = optimizer.get_visuals_for_snapshot(cur_data)
                rows = [tensor2im(v) for v in visuals.values()]
                grid = tile_images(
                    np.concatenate(rows, 0), picturesPerRow=rows[0].shape[0]
                )
                save_image(
                    grid,
                    f"{opt.checkpoints_dir}/{opt.name}/snapshots/"
                    f"{iter_counter.steps_so_far:09d}.png",
                )
            if iter_counter.needs_saving():
                # async: the ~GBs device->host fetch + serialization run in
                # the background while training continues
                optimizer.save(iter_counter.steps_so_far, blocking=False)
            if iter_counter.needs_evaluation():
                if _jax.process_count() > 1:
                    # evaluator jits are single-host programs; running them
                    # against the globally-replicated params would need
                    # local param copies. Skipped under multi-host (the
                    # reference also evaluates on rank 0 only, with DDP's
                    # per-rank module replica).
                    if primary:
                        print("[eval] skipped under multi-host training; "
                              "run test.py on the checkpoints instead")
                else:
                    metrics = evaluators.evaluate(
                        model, dataset, iter_counter.steps_so_far
                    )
                    metric_tracker.update_metrics(metrics, smoothe=False)
            if iter_counter.completed_training():
                break
            iter_counter.record_one_iteration()

    optimizer.save(iter_counter.steps_so_far)
    print("Training finished.")


if __name__ == "__main__":
    main()

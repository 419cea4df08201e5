"""Trainer runners — the shared bodies behind the per-family CLI scripts.

Family map onto the reference scripts (SURVEY.md §2.2):
- run_supervised(whole_frames=True)   <- upscaling/train.py
- run_supervised(whole_frames=False)  <- upscaling/train_mini.py (per-batch
  re-crop, train_mini.py:227)
- run_cgc(fresh_crops=False)          <- upscaling/train_cgc.py
- run_cgc(fresh_crops=True)           <- upscaling/train_cgc_mini.py
- run_gan(...)                        <- upscaling/train_gan.py /
  train_gan2.py / train_gan3.py (adv loss + discriminator choice)
- run_cyclegan(...)                   <- the external CycleGAN stage
  brought in-scope (BASELINE config 3)

Every family: one fused jitted step, EWMA/TSV/progress artifacts, best +
periodic checkpoints, sample-image dumps — optionally data-parallel over
the local device mesh (--data-parallel).
"""

from __future__ import annotations

import itertools
import os
from typing import Optional

import jax
import numpy as np

from video_cycle_gan_upscaling_tpu.cli.common import Run, images_dir
from video_cycle_gan_upscaling_tpu.data import (
    CgcBatcher,
    PairBatcher,
    UnpairedBatcher,
    crop_images_cgc,
    downscale_images,
    join_cgc,
    load_images_from_dir,
    load_images_from_dir_and_downscale,
    prefetch_to_device,
    split_images_train_test,
)
from video_cycle_gan_upscaling_tpu.ops.codec import images_to_batch
from video_cycle_gan_upscaling_tpu.parallel import (
    data_parallel_step,
    make_mesh,
    shard_batch,
)
from video_cycle_gan_upscaling_tpu.train import (
    create_cyclegan_state,
    create_gan_state,
    create_generator_state,
    make_cyclegan_step,
    make_gan_step,
    make_optimizer,
    make_supervised_step,
)
from video_cycle_gan_upscaling_tpu.train.loop import run_training_loop
from video_cycle_gan_upscaling_tpu.utils.logging import save_sample_images
from video_cycle_gan_upscaling_tpu.utils.summary import write_summary


def _maybe_tqdm():
    try:
        from tqdm import tqdm

        return tqdm
    except Exception:
        return None


def _wrap_dp(run: Run, step, n_batch_args: int):
    """Apply --data-parallel: reshard the jitted step over a 1-D mesh."""
    if not run.cfg.train.data_parallel:
        return step, None
    mesh = make_mesh()
    n = len(mesh.devices.reshape(-1))
    print(f"Data-parallel over {n} devices")
    return data_parallel_step(step, mesh, n_batch_args), mesh


def _batches(run: Run, batcher, mesh):
    sharding = None
    if mesh is not None:
        from video_cycle_gan_upscaling_tpu.parallel.mesh import batch_sharding

        sharding = batch_sharding(mesh)
    return prefetch_to_device(iter(batcher), size=2, sharding=sharding)


def _predict_fn(run: Run, model):
    @jax.jit
    def predict(params, x):
        return model.apply({"params": params}, x)

    return predict


def _dump_predictions(run: Run, predict, params, images, tag: str,
                      batch_idx: int, suffix: str = ""):
    """Render per-checkpoint sample upscales (train.py:265-266 analog)."""
    arrs = images_to_batch(images)
    outs = []
    for i in range(arrs.shape[0]):
        outs.append(np.asarray(predict(params, arrs[i:i + 1])[0]))
    save_sample_images(outs, run.dirs["images"], f"{run.cfg.prefix}_{tag}",
                       suffix=suffix, batch=batch_idx)


# --------------------------------------------------------------- supervised
def run_supervised(run: Run, whole_frames: bool):
    cfg = run.cfg
    tqdm = _maybe_tqdm()

    if whole_frames:
        df = load_images_from_dir_and_downscale(
            images_dir(cfg), cfg.data.ext, limit=cfg.data.image_count,
            downscale_factor=cfg.train.downscale_factor, prog_func=tqdm)
        crop = None
    else:
        df = load_images_from_dir(
            images_dir(cfg), cfg.data.ext, limit=cfg.data.image_count,
            min_shape=(cfg.train.output_width, cfg.train.output_height),
            prog_func=tqdm)
        crop = (cfg.train.output_width, cfg.train.output_height)

    train_df, test_df = split_images_train_test(
        df, cfg.data.train_test_ratio, seed=cfg.data.split_seed)
    run.save_parameters({"train_set": list(train_df.filename),
                         "test_set": list(test_df.filename)})

    model = run.generator()
    content = run.content_loss(per_example=True)
    batcher = PairBatcher(train_df, cfg.train.batch_size, seed=cfg.train.seed,
                          crop=crop, downscale_factor=cfg.train.downscale_factor)
    lr0, hr0 = batcher.next_batch()
    state = create_generator_state(
        model, jax.random.PRNGKey(cfg.train.seed), lr0,
        make_optimizer(cfg.train.learning_rate, cfg.train.adam_b1, cfg.train.adam_b2))
    write_summary(os.path.join(run.dirs["losses"], "model_summary.txt"),
                  state.params, cfg.model.generator)
    state = run.maybe_resume(state)

    step = make_supervised_step(content, seed=cfg.train.seed)
    step, mesh = _wrap_dp(run, step, 2)
    predict = _predict_fn(run, model)

    sample_train = _samples_for(train_df, whole_frames, crop, cfg)
    sample_test = _samples_for(test_df, whole_frames, crop, cfg)

    def on_save(state, b):
        _dump_predictions(run, predict, state.params, sample_train, "train", b)
        if len(sample_test):
            _dump_predictions(run, predict, state.params, sample_test, "test", b)

    return run_training_loop(
        step, state, _batches(run, batcher, mesh), cfg.train.number_of_batches,
        best_metric="loss", ewma_rate=cfg.train.ewma_rate,
        model_save_freq=cfg.train.model_save_freq,
        loss_log=run.loss_log, best_log=run.best_log, progress=run.progress,
        ckpt=run.ckpt, on_save=on_save, prog_func=tqdm)


def _samples_for(df, whole_frames, crop, cfg, n=10):
    if len(df) == 0:
        return []
    if whole_frames:
        return list(df["image_lr"][:n])
    # fixed sample crops from the first rows for comparable dumps
    from video_cycle_gan_upscaling_tpu.data import crop_images

    sub = crop_images(df.iloc[:n], target_shape=crop,
                      downscale_ratio=cfg.train.downscale_factor,
                      seed=cfg.data.split_seed)
    return list(sub["image_cropped_lr"])


# --------------------------------------------------------------------- cgc
def _load_cgc(run: Run):
    cfg = run.cfg
    tqdm = _maybe_tqdm()
    full = load_images_from_dir(images_dir(cfg), cfg.data.ext,
                                limit=cfg.data.image_count,
                                min_shape=(1, 1), prog_func=tqdm)
    full = downscale_images(full, cfg.train.downscale_factor)
    full = full.rename(columns={"image_hr": "fullhd", "downscaled": "scaled"})
    g1 = load_images_from_dir(images_dir(cfg, "1gen"), cfg.data.ext,
                              min_shape=(1, 1), prog_func=tqdm)
    g2 = load_images_from_dir(images_dir(cfg, "2gen"), cfg.data.ext,
                              min_shape=(1, 1), prog_func=tqdm)
    return join_cgc(full, g1, g2)


def run_cgc(run: Run, fresh_crops: bool, gan: bool = False):
    """cgc supervised (gan=False) or cgc GAN (gan=True) training."""
    cfg = run.cfg
    tqdm = _maybe_tqdm()
    df = _load_cgc(run)

    target_shape = (cfg.train.output_width, cfg.train.output_height)
    if fresh_crops:
        # precompute one seeded crop set for sample dumps; batcher re-crops
        df = crop_images_cgc(df, target_shape=target_shape,
                             downscale_ratio=cfg.train.downscale_factor,
                             seed=cfg.data.split_seed)
    else:
        # whole-frame training: the "crops" are the full frames
        df = df.assign(cropped_hd=df.fullhd, cropped_scaled=df.scaled,
                       cropped_gen1=df.gen1, cropped_gen2=df.gen2)

    train_df, test_df = split_images_train_test(
        df, cfg.data.train_test_ratio, seed=cfg.data.split_seed)
    run.save_parameters({"train_set": list(train_df.filename),
                         "test_set": list(test_df.filename)})

    batcher = CgcBatcher(train_df, cfg.train.batch_size, seed=cfg.train.seed,
                         fresh_crops=fresh_crops, crop=target_shape,
                         downscale_factor=cfg.train.downscale_factor)
    lr0, hr0 = batcher.next_batch()

    model = run.generator()
    tx = make_optimizer(cfg.train.learning_rate, cfg.train.adam_b1, cfg.train.adam_b2)
    predict = _predict_fn(run, model)

    def on_save_params(params, b):
        for tag, d in (("train", train_df), ("test", test_df)):
            if len(d) == 0:
                continue
            for col, sfx in (("cropped_gen1", "_1gen"), ("cropped_gen2", "_2gen"),
                             ("cropped_scaled", "_scal")):
                _dump_predictions(run, predict, params, list(d[col][:10]),
                                  tag, b, suffix=sfx)

    if gan:
        disc = run.discriminator()
        state = create_gan_state(model, disc, jax.random.PRNGKey(cfg.train.seed),
                                 lr0, hr0, g_tx=tx, d_tx=make_optimizer(
                                     cfg.train.learning_rate, cfg.train.adam_b1,
                                     cfg.train.adam_b2))
        write_summary(os.path.join(run.dirs["losses"], "model_summary.txt"),
                      {"generator": state.g.params, "discriminator": state.d.params},
                      f"{cfg.model.generator} + {cfg.model.discriminator}")
        state = run.maybe_resume(state)
        step = make_gan_step(run.adversarial(), run.content_loss(),
                             cfg.loss.content_loss_weight,
                             cfg.loss.adversarial_loss_weight)
        step, mesh = _wrap_dp(run, step, 2)
        best_metric = "loss_gan_gen"  # generator-content EWMA (train_gan.py:327)
        on_save = lambda state, b: on_save_params(state.g.params, b)
    else:
        state = create_generator_state(model, jax.random.PRNGKey(cfg.train.seed),
                                       lr0, tx)
        state = run.maybe_resume(state)
        step = make_supervised_step(run.content_loss(per_example=True),
                                    n_sources=3,
                                    source_names=("1gen", "2gen", "scal"),
                                    seed=cfg.train.seed)
        step, mesh = _wrap_dp(run, step, 2)
        best_metric = "loss"
        on_save = lambda state, b: on_save_params(state.params, b)

    return run_training_loop(
        step, state, _batches(run, batcher, mesh), cfg.train.number_of_batches,
        best_metric=best_metric, ewma_rate=cfg.train.ewma_rate,
        model_save_freq=cfg.train.model_save_freq,
        loss_log=run.loss_log, best_log=run.best_log, progress=run.progress,
        ckpt=run.ckpt, on_save=on_save, prog_func=tqdm)


def run_gan(run: Run):
    """SRGAN-family trainer on cgc data (train_gan*.py parity)."""
    return run_cgc(run, fresh_crops=True, gan=True)


# ---------------------------------------------------------------- cyclegan
def run_cyclegan(run: Run, domain_a_dir: str, domain_b_dir: str):
    cfg = run.cfg
    tqdm = _maybe_tqdm()
    df_a = load_images_from_dir(domain_a_dir, cfg.data.ext,
                                limit=cfg.data.image_count,
                                min_shape=(cfg.train.output_width,
                                           cfg.train.output_height),
                                prog_func=tqdm)
    df_b = load_images_from_dir(domain_b_dir, cfg.data.ext,
                                limit=cfg.data.image_count,
                                min_shape=(cfg.train.output_width,
                                           cfg.train.output_height),
                                prog_func=tqdm)
    tr_a, te_a = split_images_train_test(df_a, cfg.data.train_test_ratio,
                                         seed=cfg.data.split_seed)
    tr_b, te_b = split_images_train_test(df_b, cfg.data.train_test_ratio,
                                         seed=cfg.data.split_seed)
    run.save_parameters({"train_set_a": list(tr_a.filename),
                         "train_set_b": list(tr_b.filename)})

    crop = (cfg.train.output_width, cfg.train.output_height)
    batcher = UnpairedBatcher(tr_a, tr_b, cfg.train.batch_size,
                              seed=cfg.train.seed, crop=crop)
    a0, b0 = batcher.next_batch()

    gen_ab, gen_ba = run.generator(), run.generator()
    disc_a, disc_b = run.discriminator(), run.discriminator()
    state = create_cyclegan_state(
        gen_ab, gen_ba, disc_a, disc_b, jax.random.PRNGKey(cfg.train.seed),
        a0, b0, pool_size=cfg.train.replay_buffer_size,
        tx_factory=lambda: make_optimizer(cfg.train.learning_rate, 0.5,
                                          cfg.train.adam_b2))
    write_summary(os.path.join(run.dirs["losses"], "model_summary.txt"),
                  {"g_ab": state.g_ab.params, "d_a": state.d_a.params},
                  "cyclegan G/D")
    state = run.maybe_resume(state)
    step = make_cyclegan_step(run.adversarial(), cfg.loss.cycle_loss_weight,
                              cfg.loss.identity_loss_weight)
    step, mesh = _wrap_dp(run, step, 2)

    pred_ab = _predict_fn(run, gen_ab)
    pred_ba = _predict_fn(run, gen_ba)

    def on_save(state, b):
        from video_cycle_gan_upscaling_tpu.data import crop_images

        for tag, df, pred, params in (("AtoB", tr_a, pred_ab, state.g_ab.params),
                                      ("BtoA", tr_b, pred_ba, state.g_ba.params)):
            sub = crop_images(df.iloc[:4], target_shape=crop,
                              seed=cfg.data.split_seed)
            _dump_predictions(run, pred, params, list(sub["image_cropped"]), tag, b)

    return run_training_loop(
        step, state, _batches(run, batcher, mesh), cfg.train.number_of_batches,
        best_metric="loss_g_total", ewma_rate=cfg.train.ewma_rate,
        model_save_freq=cfg.train.model_save_freq,
        loss_log=run.loss_log, best_log=run.best_log, progress=run.progress,
        ckpt=run.ckpt, on_save=on_save, prog_func=tqdm)

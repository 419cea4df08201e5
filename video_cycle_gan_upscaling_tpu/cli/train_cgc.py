"""cgc whole-frame trainer: one upscaler maps gen1/gen2/scaled LR variants
back to the same fullhd target — simultaneous 4x SR + CycleGAN-artifact
removal (reference: upscaling/train_cgc.py; fused per-source metrics
replace its three sequential train_on_batch calls, train_cgc.py:275-284).

Defaults parity: bs=1, 40,001 batches, ic=3000."""

from video_cycle_gan_upscaling_tpu.cli.common import Run, build_parser, config_from_args
from video_cycle_gan_upscaling_tpu.cli.trainers import run_cgc

CGC_METRICS = ["loss", "loss_1gen", "loss_2gen", "loss_scal"]


def main(argv=None):
    parser = build_parser("cgc", defaults=dict(
        image_count=3000, batch_size=1, number_of_batches=40001))
    args = parser.parse_args(argv)
    cfg = config_from_args(args, "cgc")
    run = Run(cfg, CGC_METRICS, args.vgg_weights, resume=args.resume)
    return run_cgc(run, fresh_crops=False)


if __name__ == "__main__":
    main()

"""cgc crop trainer: aligned 512-crop quads, one mixed batch per step
(reference: upscaling/train_cgc_mini.py:269-275)."""

from video_cycle_gan_upscaling_tpu.cli.common import Run, build_parser, config_from_args
from video_cycle_gan_upscaling_tpu.cli.train_cgc import CGC_METRICS
from video_cycle_gan_upscaling_tpu.cli.trainers import run_cgc


def main(argv=None):
    parser = build_parser("cgc_mini", defaults=dict(
        image_count=3000, batch_size=2, number_of_batches=200001,
        output_height=512, output_width=512))
    args = parser.parse_args(argv)
    cfg = config_from_args(args, "cgc_mini")
    run = Run(cfg, CGC_METRICS, args.vgg_weights, resume=args.resume)
    return run_cgc(run, fresh_crops=True)


if __name__ == "__main__":
    main()

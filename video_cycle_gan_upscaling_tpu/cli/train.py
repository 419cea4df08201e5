"""Supervised whole-frame SR trainer (reference: upscaling/train.py).

Defaults parity: bs=1, 40,001 batches, ic=1000, full-frame 1080x1920
output (train.py:46-48, 66)."""

from video_cycle_gan_upscaling_tpu.cli.common import Run, build_parser, config_from_args
from video_cycle_gan_upscaling_tpu.cli.trainers import run_supervised


def main(argv=None):
    parser = build_parser("train", defaults=dict(
        image_count=1000, batch_size=1, number_of_batches=40001,
        output_height=1080, output_width=1920, train_test_ratio=0.95))
    args = parser.parse_args(argv)
    cfg = config_from_args(args, "train")
    run = Run(cfg, ["loss"], args.vgg_weights, resume=args.resume)
    return run_supervised(run, whole_frames=True)


if __name__ == "__main__":
    main()

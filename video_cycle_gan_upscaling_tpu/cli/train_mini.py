"""Supervised crop SR trainer with per-batch re-crop (reference:
upscaling/train_mini.py — the only reference script with per-batch
augmentation, train_mini.py:227).

Defaults parity: bs=8, 200,001 batches, 512x512 crops, ic=3000, tr=0.98."""

from video_cycle_gan_upscaling_tpu.cli.common import Run, build_parser, config_from_args
from video_cycle_gan_upscaling_tpu.cli.trainers import run_supervised


def main(argv=None):
    parser = build_parser("mini", defaults=dict(
        image_input_dir="ukiyo-e_raw", image_count=3000, batch_size=8,
        number_of_batches=200001, output_height=512, output_width=512,
        train_test_ratio=0.98))
    args = parser.parse_args(argv)
    cfg = config_from_args(args, "mini")
    run = Run(cfg, ["loss"], args.vgg_weights, resume=args.resume)
    return run_supervised(run, whole_frames=False)


if __name__ == "__main__":
    main()

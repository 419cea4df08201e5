"""Full CycleGAN trainer: G_A/G_B + D_A/D_B, LSGAN + cycle + identity
losses, HBM replay buffers (BASELINE config 3 — the external CycleGAN
stage of the reference pipeline brought in-scope)."""

from video_cycle_gan_upscaling_tpu.cli.common import (
    Run,
    build_parser,
    config_from_args,
    images_dir,
)
from video_cycle_gan_upscaling_tpu.cli.trainers import run_cyclegan

CYCLEGAN_METRICS = ["loss_g_total", "loss_g_adv", "loss_cycle",
                    "loss_identity", "loss_d_a", "loss_d_b"]


def main(argv=None):
    parser = build_parser("cyclegan", defaults=dict(
        image_input_dir="photo_fullhd", generator_model="cyclegan-resnet",
        discriminator_model="patchgan", content_loss="mae",
        discriminator_loss="lsgan", batch_size=1, number_of_batches=200001,
        output_height=256, output_width=256))
    parser.add_argument("-ib", "--image_input_dir_b", default="ukiyo-e_fullhd",
                        help="Domain-B image dir (subdir of images root)")
    parser.add_argument("--cycle-weight", type=float, default=10.0)
    parser.add_argument("--identity-weight", type=float, default=5.0)
    args = parser.parse_args(argv)
    cfg = config_from_args(args, "cyclegan")
    cfg.loss.cycle_loss_weight = args.cycle_weight
    cfg.loss.identity_loss_weight = args.identity_weight
    run = Run(cfg, CYCLEGAN_METRICS, args.vgg_weights, resume=args.resume)
    import os

    dir_a = images_dir(cfg)
    dir_b = os.path.join(cfg.data.images_root, args.image_input_dir_b)
    return run_cyclegan(run, dir_a, dir_b)


if __name__ == "__main__":
    main()

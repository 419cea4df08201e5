from video_cycle_gan_upscaling_tpu.train.state import (  # noqa: F401
    GanTrainState,
    CycleGanTrainState,
    ReplayBuffer,
    make_optimizer,
    create_generator_state,
    create_gan_state,
    create_cyclegan_state,
)
from video_cycle_gan_upscaling_tpu.train.steps import (  # noqa: F401
    make_supervised_step,
    make_gan_step,
    make_cyclegan_step,
)
from video_cycle_gan_upscaling_tpu.train.distill import (  # noqa: F401
    make_distill_step,
    make_eval_psnr,
    select_student_blocks,
    student_params_from_teacher,
)

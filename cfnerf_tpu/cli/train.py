"""Training / evaluation entry point.

Usage parity with the reference launch scripts
(/root/reference/train_NF.sh, test_NF.sh):

    python -m cfnerf_tpu.cli.train --config configs/africa_ds.txt \
        --expname africa --N_rand 512 --N_samples 128 --n_flows 4 \
        --h_alpha_size 64 --h_rgb_size 64 --K_samples 32 \
        --type_flows triangular --beta1 0.01 --depth_lambda 0.01 \
        --netdepth 8 --netwidth 512 --is_train

Evaluation: the reference's `test_NF.sh` drops --is_train, which in the
snapshot makes __main__ a no-op (SURVEY.md section 2 defect); the intended
behavior — evaluate via --render_only — works here, and a bare invocation
without --is_train also routes to render_only rather than silently exiting.
"""
from __future__ import annotations

from cfnerf_tpu.utils.config import parse_args
from cfnerf_tpu.train.loop import train


def main(argv=None):
    args = parse_args(argv)
    if not args.is_train and not args.render_only:
        print("--is_train not set: running evaluation (--render_only).")
        args.render_only = True
    train(args)


if __name__ == "__main__":
    main()

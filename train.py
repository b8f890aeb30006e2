'''
Training CLI — flag-compatible with the reference (/root/reference/train.py:321-346).

Example (reference README.md:42):
  python train.py --name v1 --data_path /path/to/kubric_random/ --batch_size 2 \
      --num_queries 3 --num_frames 30 --causal_attention 1
'''

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _select_platform():
    # Honor --device cpu for local debugging; default = whatever jax finds (TPU).
    if '--device' in sys.argv:
        dev = sys.argv[sys.argv.index('--device') + 1]
        if dev == 'cpu':
            os.environ['JAX_PLATFORMS'] = 'cpu'
            import jax
            jax.config.update('jax_platforms', 'cpu')


def main():
    _select_platform()
    from tcow_tpu import config as config_lib
    from tcow_tpu.train import driver
    from tcow_tpu.utils.logvis import MyLogger

    args = config_lib.train_args()
    logger = MyLogger(args, context='train')
    logger.info(f'Args: {vars(args)}')
    try:
        driver.main(args, logger)
        logger.info('Finished train.py')
    except Exception as e:
        logger.exception(e)
        raise


if __name__ == '__main__':
    main()

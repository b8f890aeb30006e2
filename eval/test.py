'''
Evaluation CLI — flag-compatible with the reference (/root/reference/eval/test.py:213-239).

Examples (reference README.md:82-96, 130):
  python eval/test.py --resume v1 --name v1_kc --data_path /path/to/kubric_containers/ \
      --num_queries 1
  python eval/test.py --resume tcow --name rb1 --data_path demo/rollball.mp4 --num_queries 1
'''

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if '--device' in sys.argv and sys.argv[sys.argv.index('--device') + 1] == 'cpu':
        os.environ['JAX_PLATFORMS'] = 'cpu'
        import jax
        jax.config.update('jax_platforms', 'cpu')
    from tcow_tpu import config as config_lib
    from tcow_tpu.evaluation import test_driver
    from tcow_tpu.utils.logvis import MyLogger

    test_args = config_lib.test_args()
    logger = MyLogger(test_args, context='test_' + test_args.name,
                      log_level=test_args.log_level)
    try:
        test_driver.main(test_args, logger)
    except Exception as e:
        logger.exception(e)
        logger.warning('Shutting down due to exception...')
        raise


if __name__ == '__main__':
    main()

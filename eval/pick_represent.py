'''
Representative aggregation CLI — flag-compatible with the reference
(/root/reference/eval/pick_represent.py:221-231).

Example:
  python eval/pick_represent.py --testres_path 'logs/v1/test_*' \
      --represent_guide rep_lists/kubric_containers.txt --output_dir represent/
'''

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from tcow_tpu.evaluation import pick_represent
    from tcow_tpu.utils.logvis import Logger

    my_args = pick_represent.get_args()
    logger = Logger(context='pickrep')
    pick_represent.main(my_args, logger)


if __name__ == '__main__':
    main()

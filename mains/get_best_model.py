"""Post-hoc best-model picker CLI (reference get_best_model.py).

Walks a grid-search results tree, reads each results.csv, recovers the trial
hyper-params from the path, and reports the best trials by mean KL /
reverse-KL / NLL-diff / score-MSE.

Usage: python mains/get_best_model.py --src_dir grid_search_results/linear \
          [--exclude substr1,substr2]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmip_tpu.gridsearch import main

if __name__ == "__main__":
    main()

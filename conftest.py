# repo-root conftest so `python -m pytest tests/` and scripts resolve the
# package without installation
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

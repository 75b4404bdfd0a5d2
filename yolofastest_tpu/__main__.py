import sys

from yolofastest_tpu.cli import main

sys.exit(main())

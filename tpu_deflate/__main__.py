from tpu_deflate.cli import main

import sys

sys.exit(main())

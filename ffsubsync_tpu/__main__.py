# -*- coding: utf-8 -*-
import sys

from ffsubsync_tpu.sync import main

if __name__ == "__main__":
    sys.exit(main())

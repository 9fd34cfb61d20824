"""`python -m fide_crawler_ray` → the ray-job-submit crawl entrypoint."""

import sys

from .job import main

sys.exit(main())

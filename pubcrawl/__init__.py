"""pubcrawl — a Ray-Data-native publication/web crawl and data-processing engine.

Built from scratch against the behavioral spec of SingularGuyLeBorn/PubCrawler
(see SURVEY.md); the execution model is idiomatic Ray Data:
``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
batches, actor pools for stateful stages (fetch sessions, URL-seen shards,
politeness token buckets), and explicit shuffles for the wide steps.

Nothing here calls ``ray.init()``/``ray.shutdown()`` — sessions are owned by
the caller (bench.py, CLI scripts, the test fixture, or the grading driver).
"""

__version__ = "0.2.0"

# public API surface (modules import lazily where heavy)
from .canon import canonical_url, canonicalize_batch, host_of, url_hash  # noqa: F401
from .hashing import xxh64, xxh64_arrow, xxh64_many  # noqa: F401
from .schemas import CHECKPOINT, FRONTIER, IMAGE_CAPTION, PAGES, SEEDS  # noqa: F401
from .store import ParquetFragmentStore, checkpoint_table, open_store  # noqa: F401
from .synthweb import SyntheticTransport, WebConfig  # noqa: F401

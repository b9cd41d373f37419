"""Source-side operators (SURVEY.md §2.1): corpus reading, crawl
discovery, conditional fetch, text chunking, binary readers.

The Parquet corpus is the primary source (``ray.data.read_parquet``
with column pruning — the *downloaded* stage as data).  The modules
here cover the rest of the reference's source surface:

* :mod:`crawl` — link enumeration → ``(basefile, url)`` rows
* :mod:`fetch` — conditional-GET actor pool (ETag/If-Modified-Since)
* :mod:`textreader` — cursor reader + paragraph/page chunking stages
* :mod:`readers` — PDF/Word actor-pool plumbing (decode stubbed:
  external binaries absent in this environment)
"""

from ferenda_ray.sources.crawl import (  # noqa: F401
    basefiles_from_html, discover, iterlinks)
from ferenda_ray.sources.fetch import (  # noqa: F401
    DictTransport, Fetcher, fetch)
from ferenda_ray.sources.textreader import (  # noqa: F401
    TextReader, pages, paragraphs, split_paragraphs)

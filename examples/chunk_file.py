"""End-to-end example: file → content-defined chunks → sha256.

The engine-side equivalent of the reference's example program
(/root/reference/src/chunker/example.d:10-40): read a file in blocks,
chunk it with the default polynomial, print (length, sha256) per chunk.
Run against the reference's deterministic 32 MiB buffer it reproduces
the reference's golden output chunk-for-chunk.

Usage: python examples/chunk_file.py [path] [n_chunks]
       (no path → the golden 32 MiB getRandom(23) buffer)
"""

import hashlib
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from chunker_spark.kernel import ChunkerParams, chunk_buffer
from chunker_spark.kernel.gorng import get_random


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else None
    limit = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    data = open(path, "rb").read() if path else get_random(23, 32 * 1024 * 1024)
    params = ChunkerParams()  # 0x3DA3358B4DC173, 512K/1M/8M — reference defaults
    for i, c in enumerate(chunk_buffer(data, params)):
        if i >= limit:
            break
        digest = hashlib.sha256(data[c.offset : c.end]).hexdigest()
        print(f"chunk {i}: offset={c.offset} length={c.length} cut={c.cut:#018x} sha256={digest}")


if __name__ == "__main__":
    main()

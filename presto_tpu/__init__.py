"""presto_tpu — a TPU-native vectorized distributed SQL query-execution engine.

A from-scratch reimplementation of the capabilities of Trino v359
(``/root/reference``, surveyed in ``SURVEY.md``) designed TPU-first:

- Columnar data lives in fixed-width struct-of-arrays device arrays with
  validity masks (the TPU analogue of Trino's ``Page``/``Block`` layer,
  reference ``core/trino-spi/src/main/java/io/trino/spi/Page.java:33``).
- Each query stage compiles to a single XLA program (the analogue of Trino's
  per-query bytecode generation in ``core/trino-main/.../sql/gen/``).
- Hash join, group-by and sort are batched columnar kernels (Pallas for the
  hot paths), replacing Trino's ``operator/join/PagesHash.java`` and
  ``operator/MultiChannelGroupByHash.java``.
- Inter-stage exchange is mesh collectives (``shard_map`` + ``all_to_all``)
  instead of Trino's HTTP page shuffle (``operator/ExchangeClient.java``).
"""

__version__ = "0.1.0"

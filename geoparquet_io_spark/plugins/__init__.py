"""Bundled CLI plugins.

External plugins register through the ``gpio_spark.plugins``
entry-point group (cli._load_plugins); the modules listed here are the
BUNDLED ones — shipped with the package so they need no installation,
loaded through the same ``register(subparsers)`` contract and the same
fault isolation as an external plugin.  Reference parity:
plugins/gpio-pmtiles is a separately-installed package there; this
engine bundles the equivalent because there is no separate wheel to
install inside a Spark job.
"""

BUNDLED = ["geoparquet_io_spark.plugins.pmtiles"]

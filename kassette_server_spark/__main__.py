"""``python -m kassette_server_spark`` boots the composed server
(gateway + config control plane + per-connection streaming delivery).
See server.py for the topology."""

from .server import main

main()

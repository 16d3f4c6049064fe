"""Source implementations: REST poller custom DataSource, file/json
landing-zone helpers."""

"""Test doubles: local REST stub server (paginated list endpoint + OAuth
token endpoint + upsert/delete capture) used by the source/sink checks."""

"""Read-only serving layer over the published tables."""

from .graphql_api import GraphQLService, SDL  # noqa: F401

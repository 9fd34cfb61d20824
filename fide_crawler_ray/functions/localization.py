"""M19: localization lookup — broadcast key → display-string dict.

The reference ships a two-language (en-US / pt-BR) key→label JSON
consumed throughout its UI (reference: localization/localization.py:3-8
and localization.json). In the engine this is a pure presentation-layer
rename of output columns: the dict is tiny, so it is captured in task
closures (broadcast by Ray's closure serialization — no shuffle, no
state). A representative key subset is bundled; callers can supply their
own full table.
"""

from __future__ import annotations

import pandas as pd

LABELS: dict[str, dict[str, str]] = {
    "en-US": {
        "date": "Date",
        "tournament_name": "Tournament Name",
        "player_rating": "Player Rating",
        "opponent_name": "Opponent Name",
        "opponent_rating": "Opponent Rating",
        "result": "Result",
        "player_color": "Color",
        "points_per_games": "Points/Games",
        "avg_opponent_rating": "Opponents Average Rating",
        "n_games": "Number of Games",
        "performance": "Performance Rating",
    },
    "pt-BR": {
        "date": "Data",
        "tournament_name": "Nome do Torneio",
        "player_rating": "Rating do Jogador",
        "opponent_name": "Nome do Oponente",
        "opponent_rating": "Rating do Oponente",
        "result": "Resultado",
        "player_color": "Cor",
        "points_per_games": "Pontos/Jogos",
        "avg_opponent_rating": "Média de Rating dos Oponentes",
        "n_games": "Número de Jogos",
        "performance": "Rating de Performance",
    },
}


def localize_columns(df: pd.DataFrame, lang: str = "en-US",
                     labels: dict | None = None) -> pd.DataFrame:
    """Rename output columns to display labels for ``lang``; unknown
    columns and unknown languages pass through unchanged."""
    table = (labels or LABELS).get(lang, {})
    return df.rename(columns={k: v for k, v in table.items() if k in df.columns})


def localize_dataset(ds, lang: str = "en-US", labels: dict | None = None):
    """Dataset variant: column rename via map_batches (no data movement)."""
    table = (labels or LABELS).get(lang, {})

    def _rename(b):
        return b.rename_columns(
            [table.get(c, c) for c in b.column_names]
        )

    return ds.map_batches(_rename, batch_format="pyarrow")

"""Sector-classification lookup data.

Domain data (not code) carried over from the reference so the
classification semantics match exactly:
- per-country constant sectors: ``/root/reference/main.py:52-55``
- per-Brazil-index sectors: ``/root/reference/main.py:57-84``
- defaults ("Diversificado" for Brazil, "Primário" otherwise):
  ``/root/reference/main.py:106``
"""

SECTOR_BY_COUNTRY = {
    "China": "Primário",
    "EUA": "Primário",
}

SECTOR_BY_BRAZIL_INDEX = {
    "Ibovespa": "Financeiro",
    "IBrX 50": "Financeiro",
    "IBrX 100": "Financeiro",
    "Brasil Amplo IBrA": "Diversificado",
    "MidLarge Cap MLCX": "Indústria",
    "Small Cap SMLL": "Indústria",
    "Tag Along ITAG": "Financeiro",
    "Gov. Corporativa Novo Mercado IGC-NM": "Governança Corporativa",
    "Ibov Smart Dividendos": "Financeiro",
    "BDRs Não Patrocinados BDRX": "Internacional",
    "Inv. Imobiliários IFIX": "Imobiliário",
    "Carbono Eficiente ICO2": "Sustentabilidade",
    "Gov. Corporativa Trade IGCT": "Governança Corporativa",
    "FTSE Brazil": "Internacional",
    "Gov. Corporativa IGC": "Governança Corporativa",
    "IVBX 2": "Diversificado",
    "Dividendos IDIV": "Financeiro",
    "Ibovespa USD": "Câmbio",
    "Ibovespa EUR": "Câmbio",
    "IFIL": "Financeiro",
    "Indice de GPTW B3": "Governança Corporativa",
    "Sustentabilidade Empresarial": "Sustentabilidade",
    "S&P/B3 Ibovespa VIX": "Volatilidade",
    "Ibovespa B3 Br+": "Financeiro",
    "Bovespa B3 Estatais": "Financeiro",
    "Bovespa B3 Empresas Privada": "Financeiro",
}

DEFAULT_SECTOR_BRAZIL = "Diversificado"
DEFAULT_SECTOR_OTHER = "Primário"

"""Deterministic multi-turn transcript synthesizer (FIXTURES.md F1/F2/F4).

Builds the authoritative input table
``transcripts(conv_id, turn_idx, role, text, tool, ts)`` plus the golden
fields/triples the synthesizer planted — styled after the reference fixture
(reference: data/raw/sample_train.json): Brazilian account-opening forms with
scalar fields, one compound address field, newline-rich layout, noisy surface
forms (dotted numbers, spelled-out state names) and cross-conversation entity
reuse (canonicalization clusters).

Everything is a pure function of (conv_id, seed): synthesis is reproducible
per conversation independently, so large inputs can be generated
*distributively* (spark.range over conv ids -> mapInPandas(synthesize)) —
that is how the bench builds multi-GB inputs without driver bottlenecks.
"""
from __future__ import annotations

import datetime as dt
import random
from typing import Dict, Iterator, List, Optional, Tuple

import pandas as pd

from information_extraction_t5_spark.core.fuzzy import STATE_NAMES

FIRST = ["ANA", "BRUNO", "CARLA", "DIOGO", "ELISA", "FABIO", "GILDA",
         "HUGO", "IARA", "JOAO", "KARLA", "LUCAS", "MARIA", "NELSON",
         "OLIVIA", "PAULO", "QUITERIA", "RAFAEL", "SILVIA", "TIAGO",
         "URSULA", "VICTOR", "WAGNER", "XIMENA", "YARA", "ZELIA",
         "ADRIANO", "BEATRIZ", "CLAUDIO", "DANIELA", "EDUARDO",
         "FERNANDA", "GUSTAVO", "HELENA", "IGOR", "JULIANA",
         "LEONARDO", "MARIANA", "NATALIA", "OTAVIO"]
MIDDLE = ["MADALENA", "AUGUSTO", "TRINDADE", "COSTA", "MOREIRA", "SILVEIRA",
          "PEREIRA", "SOUZA", "LIMA", "ROCHA", "TEIXEIRA", "CARDOSO",
          "BATISTA", "CAMPOS", "DUARTE", "ESTEVES", "FONSECA", "GUIMARAES",
          "HENRIQUES", "IGLESIAS", "JUSTINO", "LACERDA", "MONTEIRO",
          "NOGUEIRA", "OSORIO", "PACHECO", "QUEIROZ", "REZENDE",
          "SAMPAIO", "TAVARES"]
LAST = ["ALVES", "SILVA", "SANTOS", "OLIVEIRA", "FERREIRA", "RODRIGUES",
        "GOMES", "MARTINS", "ARAUJO", "BARBOSA", "RIBEIRO", "CARVALHO",
        "DOMINGUES", "ESPINOSA", "FIGUEIREDO", "GONCALVES", "HOLANDA",
        "ITABORAI", "JACINTO", "LOUREIRO", "MASCARENHAS", "NEVES",
        "OTTONI", "PIMENTEL", "QUINTANA", "REIS", "SIQUEIRA",
        "TOLENTINO", "VASCONCELOS", "XAVIER"]
STREETS = ["CRESCENCIO LISBOA", "ANDERSON TEIXEIRA", "PEDRO BIAGI",
           "REGENTE FEIJO", "ALBERT EINSTEIN", "SETE DE SETEMBRO",
           "DAS FLORES", "SANTOS DUMONT", "BARAO DE ITAPURA"]
STREET_KINDS = ["RUA", "AV.", "PCA", "ESTRADA"]
BAIRROS = ["BARAUNA", "CAONZE", "CENTRO", "VILA FORMOSA", "JARDIM PAULISTA",
           "CIDADE UNIVERSITARIA", "SANTA CECILIA", "BELA VISTA"]
CIDADES = ["BARREIRAS", "NOVA IGUACU", "CAMPINAS", "SERTAOZINHO", "CAUCAIA",
           "SAO PAULO", "FORTALEZA", "BELO HORIZONTE", "CURITIBA"]
ORGAOS = ["SSP", "DETRAN", "IFP", "SSP-SP"]
FILLER = [
    "Condição de Movimentação da Conta X Individual",
    "Alteração cadastral",
    "Documento de Identificação CNH CTPS Entidade de Classe",
    "Protocolo Refugiado RIC RNE",
    "Nacionalidade x Brasileira",
    "Cidadania BRASILEIRA",
    "Domicílio fiscal BRASIL",
    "Adesão a Produtos e Serviços Bancários - Pessoa Física",
    "Guia de Acolhimento ao Menor Registro Nacional Migratório",
    "Para Constar, foi lavrada a presente Certidão.",
]

ROLES = ["user", "assistant", "tool"]
SCALAR_FIELDS = ["etiqueta", "agencia", "conta_corrente", "cpf",
                 "nome_completo", "n_doc_serie", "orgao_emissor",
                 "data_emissao", "data_nascimento", "nome_mae", "nome_pai"]
ADDR_FIELDS = ["logradouro", "numero", "complemento", "bairro", "cidade",
               "estado", "cep"]

_EPOCH = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)


def _rng(seed: int, conv: int) -> random.Random:
    return random.Random(f"{seed}:{conv}")


def _digits(r: random.Random, n: int) -> str:
    return "".join(str(r.randint(0, 9)) for _ in range(n))


def _date(r: random.Random, y0: int, y1: int) -> str:
    return (f"{r.randint(1, 28):02d}/{r.randint(1, 12):02d}/"
            f"{r.randint(y0, y1)}")


def _person(r: random.Random) -> Tuple[str, str, str, str]:
    first, mid, last = r.choice(FIRST), r.choice(MIDDLE), r.choice(LAST)
    nome = f"{first} {mid} {last}"
    cpf = f"{_digits(r, 3)}.{_digits(r, 3)}.{_digits(r, 3)}-{_digits(r, 2)}"
    mae = f"{r.choice(FIRST)} {r.choice(MIDDLE)} {mid}"
    pai = f"{r.choice(FIRST)} {r.choice(MIDDLE)} {last}"
    return nome, cpf, mae, pai


def golden_fields(conv_id: str, seed: int = 42,
                  share_period: int = 7) -> Dict[str, Optional[str]]:
    """Golden (planted) field values for one conversation.

    Every ``share_period``-th conversation reuses the person of the previous
    conversation => cross-conversation entity clusters for canonicalization.
    """
    idx = int(conv_id.split("_")[-1])
    r = _rng(seed, idx)

    if idx % share_period == share_period - 1 and idx > 0:
        donor = _rng(seed, idx - 1)
        for _ in range(3):
            donor.random()
        nome, cpf, mae, pai = _person(donor)
        for _ in range(3):
            r.random()
        _person(r)  # keep stream aligned
    else:
        for _ in range(3):
            r.random()
        nome, cpf, mae, pai = _person(r)

    estado = r.choice(sorted(STATE_NAMES.keys()))
    agencia = _digits(r, 4)
    fields: Dict[str, Optional[str]] = {
        "etiqueta": f"ID{idx:05d}",
        "agencia": agencia,
        "conta_corrente": f"00{_digits(r, 2)}-{agencia}-{_digits(r, 13)}",
        "cpf": cpf,
        "nome_completo": nome,
        "n_doc_serie": _digits(r, 8),
        "orgao_emissor": r.choice(ORGAOS),
        "data_emissao": _date(r, 2015, 2024),
        "data_nascimento": _date(r, 1950, 2005),
        "nome_mae": mae,
        "nome_pai": pai,
        "logradouro": f"{r.choice(STREET_KINDS)} {r.choice(STREETS)}",
        "numero": str(r.randint(1, 9999)),
        "complemento": f"Apto {r.randint(1, 99)}" if r.random() < 0.6 else None,
        "bairro": r.choice(BAIRROS),
        "cidade": r.choice(CIDADES),
        "estado": estado,
        "cep": f"{_digits(r, 5)}-{_digits(r, 3)}",
    }
    # controlled missingness: exercises the N/A anti-join
    if r.random() < 0.15:
        fields["nome_pai"] = None
    if r.random() < 0.10:
        fields["data_nascimento"] = None
    if r.random() < 0.10:
        fields["complemento"] = None
    return fields


def document_lines(conv_id: str, seed: int = 42) -> List[str]:
    """The newline-delimited form text with the golden values planted.

    Surface noise (deterministic per conversation): the document number may
    carry thousands dots; the state may be spelled out (alias linking);
    filler lines pad the text so several windows are needed.
    """
    idx = int(conv_id.split("_")[-1])
    f = golden_fields(conv_id, seed)
    r = _rng(seed, 10_000_000 + idx)  # independent noise stream

    n_doc = f["n_doc_serie"]
    if r.random() < 0.2 and n_doc:
        n_doc = f"{n_doc[:2]}.{n_doc[2:5]}.{n_doc[5:]}"  # dotted surface form
    estado_surface = (
        STATE_NAMES[f["estado"]] if r.random() < 0.5 else f["estado"]
    )

    lines = [
        "Proposta de Abertura de Conta, Contratação de Crédito e",
        "Adesão a Produtos e Serviços Bancários - Pessoa Física",
        f["etiqueta"],
        "Agência Nº",
        f["agencia"],
        f"Conta Corrente {f['conta_corrente']}",
    ]
    lines += r.sample(FILLER, k=3)
    lines += [
        "Dados Básicos do Titular",
        "CPF",
        f["cpf"],
        f"Nome Completo {f['nome_completo']}",
        "Nº Documento / Nº da Série (CTPS)",
        f"{n_doc} Órgão Emissor {f['orgao_emissor']}",
    ]
    if f["data_emissao"]:
        lines.append(f"Data de Emissão {f['data_emissao']}")
    if f["data_nascimento"]:
        lines.append(f"| Data de Nascimento {f['data_nascimento']} Sexo X F M")
    lines += r.sample(FILLER, k=2)
    lines.append(f"Nome da Mãe {f['nome_mae']}")
    if f["nome_pai"]:
        lines.append(f"Nome do Pai {f['nome_pai']}")
    lines += [
        "Endereços",
        "Endereço Residencial",
        f"Rua/Av/Pça/Estrada {f['logradouro']}",
        "Número",
        f"{f['numero']} Complemento {f['complemento']}"
        if f["complemento"] else f["numero"],
        f"Bairro {f['bairro']}",
        f"Município {f['cidade']}",
        f"UF {estado_surface}",
        "País BRASIL",
        f["cep"],
    ]
    lines += r.sample(FILLER, k=r.randint(2, 5))
    return lines


def conversation_turns(conv_id: str, seed: int = 42) -> List[dict]:
    """Split the form lines into 1-3-line turns with roles/tools/timestamps.

    Invariant (checked by tests + the driver's per-turn equality rule):
    ``'\\n'.join(turn texts ordered by turn_idx) == '\\n'.join(lines)``.
    """
    idx = int(conv_id.split("_")[-1])
    lines = document_lines(conv_id, seed)
    r = _rng(seed, 20_000_000 + idx)

    turns: List[dict] = []
    i = 0
    while i < len(lines):
        take = min(r.randint(1, 3), len(lines) - i)
        role = ROLES[len(turns) % 2] if r.random() < 0.85 else "tool"
        turns.append(
            {
                "conv_id": conv_id,
                "turn_idx": len(turns),
                "role": role,
                "text": "\n".join(lines[i : i + take]),
                "tool": "form_reader" if role == "tool" else None,
                "ts": _EPOCH
                + dt.timedelta(hours=idx, seconds=37 * len(turns)),
            }
        )
        i += take
    return turns


def golden_triples(conv_id: str, seed: int = 42) -> List[Tuple[str, str, str]]:
    """(conv_id, predicate, canonical object) the pipeline must recover."""
    f = golden_fields(conv_id, seed)
    out = []
    for k in SCALAR_FIELDS:
        if f.get(k):
            out.append((conv_id, f"form.{k}", f[k]))
    for k in ADDR_FIELDS:
        if f.get(k):
            out.append((conv_id, f"form.endereco.{k}", f[k]))
    return out


# ---------------------------------------------------------------------------
# Spark-side constructors
# ---------------------------------------------------------------------------

TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def conv_ids(n: int) -> List[str]:
    return [f"conv_{i:06d}" for i in range(n)]


def transcripts_pdf(n_convs: int, seed: int = 42) -> pd.DataFrame:
    rows = []
    for cid in conv_ids(n_convs):
        rows.extend(conversation_turns(cid, seed))
    return pd.DataFrame(rows)


def transcripts_df(spark, n_convs: int, seed: int = 42,
                   partitions: Optional[int] = None):
    """Distributed synthesis: spark.range over conv indices -> mapInPandas.

    Scales linearly with executors; the driver never materializes the data.
    """
    n_parts = partitions or max(8, n_convs // 2000)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = [
                pd.DataFrame(conversation_turns(f"conv_{int(i):06d}", seed))
                for i in pdf["id"]
            ]
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return (
        spark.range(0, n_convs, 1, n_parts)
        .mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)
    )


def golden_triples_df(spark, n_convs: int, seed: int = 42):
    rows = []
    for cid in conv_ids(n_convs):
        rows.extend(golden_triples(cid, seed))
    return spark.createDataFrame(rows, "conv_id string, pred string, obj string")

import re, sys, collections

SRC = 'src/main/scala/graft/queries/Extensions.scala'
lines = open(SRC).read().split('\n')  # 0-indexed; file line N = lines[N-1]

Q_START, Q_END = 29, 3544      # entry lines inside queries Map( ... ) exclusive of closing ')'
H_START, H_END = 3546, 4252    # helpers region
O_DEF_START, O_DEF_END = 4253, 4263  # def oracles composition
O_START, O_END = 4266, 7301    # entries inside oraclesBase Map(

def domain(name):
    if name.startswith('text_'): return 'ExtText'
    if name.startswith(('train_','layout_')): return 'ExtTrain'
    if name.startswith('dedup_'): return 'ExtDedup'
    if name.startswith(('sim_','rank_')): return 'ExtSim'
    if name.startswith(('events_','ops_','ts_','graph_')): return 'ExtEvents'
    if name.startswith(('diag_','agg_','sort_','scalar_')): return 'ExtDiag'
    if name.startswith(('pipeline_','pipe_','multimodal_','join_')): return 'ExtPipe'
    raise ValueError('unclassified: ' + name)

ENTRY_RE = re.compile(r'^    "(\w+)" ->')

def chunks(start, end):
    """Return list of (name, chunk_lines) tiling lines[start-1:end]."""
    starts = []
    for i in range(start, end+1):
        m = ENTRY_RE.match(lines[i-1])
        if m: starts.append((i, m.group(1)))
    out = []
    # walk back over comments/blanks to attach preceding comment block
    adj = []
    for (i, name) in starts:
        j = i
        while j-1 >= start and (lines[j-2].strip() == '' or lines[j-2].lstrip().startswith('//') or lines[j-2].lstrip().startswith('*') or lines[j-2].lstrip().startswith('/**')):
            j -= 1
        adj.append((j, i, name))
    # fix overlaps: chunk i starts at adj[i], ends at adj[i+1]-1
    for k, (j, i, name) in enumerate(adj):
        e = adj[k+1][0]-1 if k+1 < len(adj) else end
        out.append((name, lines[j-1:e]))
    # sanity: tiling
    total = sum(len(c) for _, c in out)
    assert adj[0][0] == start, f"first chunk starts at {adj[0][0]} not {start}"
    assert total == end - start + 1, (total, end-start+1)
    return out

qchunks = chunks(Q_START, Q_END)
ochunks = chunks(O_START, O_END)
print('query entries:', len(qchunks), 'oracle entries:', len(ochunks))

doms = ['ExtText','ExtTrain','ExtDedup','ExtSim','ExtEvents','ExtDiag','ExtPipe']
qby = collections.defaultdict(list); oby = collections.defaultdict(list)
for n, c in qchunks: qby[domain(n)].append((n,c))
for n, c in ochunks: oby[domain(n)].append((n,c))

HEADER = '''package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, Hll, Multimodal, Ranking, Similarity, StoreCompaction, TextAnalysis => TA}
import ExtShared._
'''

def ensure_comma(chunk):
    c = list(chunk)
    # find last non-blank line; append ',' if it doesn't end with one
    for idx in range(len(c)-1, -1, -1):
        if c[idx].strip():
            if not c[idx].rstrip().endswith(','):
                c[idx] = c[idx].rstrip() + ','
            break
    return c

DESC = {
 'ExtText': 'Text-analysis lanes (langid, quality, tokens, chunking, BPE encode, fingerprints).',
 'ExtTrain': 'Training-mix lanes (sampling, packing, splits, decontamination, BPE training).',
 'ExtDedup': 'Deduplication lanes (exact, MinHash/LSH, SimHash, PPJoin, components, semantic).',
 'ExtSim': 'Similarity-search + ranking lanes (ANN brute/LSH/IVF/PQ, BM25, NDCG).',
 'ExtEvents': 'Event/session analytics, time-series and graph lanes.',
 'ExtDiag': 'Diagnostics/profiling lanes plus sketch aggregates (HLL, weighted median).',
 'ExtPipe': 'Pipeline-composition, multimodal and specialty-join lanes.',
}

for d in doms:
    body = [HEADER]
    body.append('/** %s\n  *\n  * Split from the former monolithic Extensions.scala (registry unchanged:\n  * [[Extensions.queries]] / [[Extensions.oracles]] concatenate the domain\n  * objects). Oracle policy and citations live on [[Extensions]].\n  */' % DESC[d])
    body.append('private[graft] object %s {\n' % d)
    body.append('  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(')
    for n, c in qby[d]:
        body.extend(ensure_comma(c))
    body.append('  )')
    body.append('')
    body.append('  def oracles: Map[String, String] = Map(')
    for n, c in oby[d]:
        body.extend(ensure_comma(c))
    body.append('  )')
    body.append('}')
    open('src/main/scala/graft/queries/%s.scala' % d, 'w').write('\n'.join(body) + '\n')
    print(d, 'queries:', len(qby[d]), 'oracles:', len(oby[d]))

# ExtShared: helpers region verbatim, with `private ` / `private[graft] ` modifiers stripped
helpers = lines[H_START-1:H_END]
shared = [
'package graft.queries',
'',
'import org.apache.spark.sql.{DataFrame, SparkSession}',
'import org.apache.spark.sql.functions._',
'',
'import graft.Tables',
'import graft.ext.{Dedup, Hll, Multimodal, Ranking, Similarity, StoreCompaction, TextAnalysis => TA}',
'',
'/** Helpers shared by the Ext* domain objects (formerly private members of',
'  * the monolithic Extensions object). The object is package-private; member',
'  * visibility is therefore unchanged in effect.',
'  */',
'private[graft] object ExtShared {',
]
for l in helpers:
    shared.append(re.sub(r'^(\s*)private(\[graft\])? ', r'\1', l))
shared.append('}')
open('src/main/scala/graft/queries/ExtShared.scala','w').write('\n'.join(shared) + '\n')
print('ExtShared lines:', len(shared))

# New Extensions.scala: keep original scaladoc (lines 1..27 up to object decl), registry + oracles composition + forwarders
newext = lines[0:25]  # through the scaladoc close; line 26 is 'object Extensions {'
newext += [
'object Extensions {',
'',
'  /** Concatenated registry over the domain objects — the split is purely',
'    * structural; key set and per-key behavior are byte-identical to the',
'    * former monolith. */',
'  def queries: Map[String, (SparkSession, String) => DataFrame] =',
'    ExtText.queries ++ ExtTrain.queries ++ ExtDedup.queries ++',
'      ExtSim.queries ++ ExtEvents.queries ++ ExtDiag.queries ++',
'      ExtPipe.queries',
'',
] + lines[O_DEF_START-1:O_DEF_END] + [
'',
'  private def oraclesBase: Map[String, String] =',
'    ExtText.oracles ++ ExtTrain.oracles ++ ExtDedup.oracles ++',
'      ExtSim.oracles ++ ExtEvents.oracles ++ ExtDiag.oracles ++',
'      ExtPipe.oracles',
'',
'  // Test-visible forwarders (BoundedWindowSpec) — implementations moved to',
'  // ExtShared with the split.',
'  private[graft] def skylinePoints(s: SparkSession, d: String): DataFrame =',
'    ExtShared.skylinePoints(s, d)',
'  private[graft] def skylineSurvivors(pts: DataFrame): DataFrame =',
'    ExtShared.skylineSurvivors(pts)',
'  private[graft] def wmedianBucketed(s: SparkSession, d: String): DataFrame =',
'    ExtShared.wmedianBucketed(s, d)',
'  private[graft] val WmedianBuckets: Int = ExtShared.WmedianBuckets',
'}',
]
# fix references to helpers in oracles composition: bpeLearnOracle/bpeApplyOracle now in ExtShared (imported? no import in Extensions) -> qualify
text = '\n'.join(newext) + '\n'
text = text.replace('bpeLearnOracle(', 'ExtShared.bpeLearnOracle(').replace('bpeApplyOracle(', 'ExtShared.bpeApplyOracle(')
open(SRC,'w').write(text)
print('new Extensions lines:', text.count('\n'))

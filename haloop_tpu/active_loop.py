"""Active-learning driver: learning to improve supervision
(reference: ha/active_loop.py).

Architectural property preserved (SURVEY.md §1): this meta-loop drives
the hac trainer BY SUBPROCESS and scrapes its TSV stdout logs — the log
format is the API. Strategies: random, oracle-max-wer, long, entropy,
prob, spin (log-prob under the <↓> prompt), egl (expected gradient
length), logfile, advantage (pos/neg expected log-prob difference).
Iterations are idempotent/resumable by file existence checks with
--start/--stop-before windows.

The hac subprocess is invoked as ``python -m haloop_tpu.loop`` (same
flags as the reference's ``hac``).
"""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

from haloop_tpu import argparse
from haloop_tpu.corr import rank_corr
from haloop_tpu.subprocess import run
from haloop_tpu.wer import (clean_tokens, compute_wer_pointwise, format_wer,
                            read_text)

HAC = [sys.executable, '-m', 'haloop_tpu.loop']


def make_parser():
    parser = argparse.ArgumentParser(
        description="Learning to improve supervision.",
        formatter_class=argparse.Formatter)
    parser.add_argument('--oracle', type=Path,
                        default=Path('data/flaky/train-clean-100.ref.txt.piece'))
    parser.add_argument('--query-size', type=str, default='10h',
                        help='utterances or hours (10h) to query')
    parser.add_argument('--initial-corrupted', type=Path,
                        default=Path('data/flaky/train-clean-100.dirty28538.txt.piece'))
    parser.add_argument('--eval', type=Path,
                        default=Path('data/flaky/dev-clean.txt.piece'))
    parser.add_argument('--vocab', type=Path,
                        default=Path('data/flaky/libribpe.vocab'))
    parser.add_argument('--duration', type=Path,
                        default=Path('data/flaky/train-clean-100.seconds'))
    parser.add_argument('--device', type=str, default='tpu')
    parser.add_argument('--seed', type=int, default=42)
    parser.add_argument('strategy', type=str, nargs='+',
                        help='random | egl | oracle-max-wer | long | entropy '
                             '| prob | spin | logfile <log> <testset> | '
                             'advantage <neglog> <negset> <poslog> <posset>')
    parser.add_argument('--start', type=int, default=0)
    parser.add_argument('--stop-before', type=int, default=10)
    parser.add_argument('--steps', type=int, default=10)
    parser.add_argument('--exp', type=Path, default=Path('exp/random'))
    parser.add_argument('--train', action='store_true',
                        help='train the model after every query')
    return parser


# --------------------------------------------------- hac log scraping


def read_grads(filename: Path):
    """Parse 'grad_norm,loss\\tindex\\tnorm\\tloss' rows (ha/grad_norm.py:49
    format)."""
    rows = []
    with open(filename) as f:
        for line in f:
            if line.startswith('grad_norm,loss'):
                _, idx, gn, loss = line.strip().split('\t')
                rows.append((int(idx), float(gn), float(loss)))
    return pd.DataFrame(
        rows, columns=['dataset_index', 'grad_norm', 'loss']
    ).set_index('dataset_index')


def training_log_to_dataset(training_log_filename: Path):
    """Extract decode hypotheses from a hac log (the 'epoch\\tidx\\thypN'
    rows emitted after a 'testing <epoch>' marker)."""
    hyps = []
    epoch_tag = None
    with open(training_log_filename) as f:
        for line in f:
            if line.startswith('testing'):
                epoch_tag = line.strip().split()[1]
            elif line.startswith('valid [12'):
                epoch_tag = '12'
            elif epoch_tag and line.startswith(epoch_tag) and 'hyp' in line:
                epoch, idx, hyp_n, text = line.strip().split('\t')
                if epoch == epoch_tag and hyp_n.startswith('hyp'):
                    hyps.append((int(idx), clean_tokens(text)))
    df = pd.DataFrame(hyps, columns=['dataset_index', 'hyp_text'])
    return df.sort_values('dataset_index').set_index('dataset_index')


def test_log_to_dataset(test_log_filename: Path):
    """Extract per-utterance stats (log_prob, entropy, prompt) from hac
    'statN' rows."""
    rows = []
    epoch_tag = None
    last_label = None
    with open(test_log_filename) as f:
        for line in f:
            if line.startswith('testing'):
                epoch_tag = line.strip().split()[1]
            elif epoch_tag and line.startswith(epoch_tag) and '\thyp' in line:
                _, _, _, last_label = line.strip().split('\t')
            elif epoch_tag and line.startswith(epoch_tag) and '\tstat' in line:
                epoch, idx, _, text_stat = line.strip().split('\t')
                stat = dict(kv.split('=') for kv in text_stat.split(' '))
                rows.append((int(idx), float(stat['log_prob']),
                             float(stat['log_prob_per_token']),
                             float(stat['entropy_per_token']),
                             stat.get('prompt', '<s>'), last_label))
    df = pd.DataFrame(rows, columns=[
        'dataset_index', 'log_prob', 'log_prob_per_token',
        'entropy_per_token', 'prompt', 'text'])
    return df.sort_values('dataset_index').set_index('dataset_index')


def estimate_egl(grad_norms_df):
    """EGL(x) = sum_y P(y|x) * ||grad log P||^2 per utterance."""
    grad_norms_df = grad_norms_df.copy()
    grad_norms_df['product'] = (grad_norms_df['grad_norm'] ** 2) * \
        np.exp(-grad_norms_df['loss'])
    egl = grad_norms_df.groupby('media_filename')['product'].apply(np.sum)
    return egl.sort_values(ascending=False)


# ---------------------------------------------------- hac subprocess


def train(root, train, eval, test, args, spin=False, test_attempts=1,
          seed=42):
    """Run a full hac training iteration unless it already completed
    (resumable by file existence)."""
    root.mkdir(exist_ok=True, parents=True)
    if (root / 'last.pt').exists() and (root / 'train.log').exists():
        return False
    prefixes = ['mask:fbank:speed:', 'mask:fbank:speed:randpairs:']
    cmd = HAC + [
        '--train', ','.join(f'{p}{train}' for p in prefixes),
        '--eval', f'fbank:{eval}',
    ]
    if test:
        cmd += ['--test', f'fbank:{test}', '--seed', str(seed),
                '--test-attempts', str(test_attempts)]
    cmd += ('--num-epochs 13 --lr_decay_iters 15835 --lr_schedule linear '
            '--warmup_iters 3000 --batch-size 24 --accumulate 2 --lr 0.0006 '
            '--min_lr 0 --eval-batch-size 512 '
            '--weight_decay 0.1').split()
    cmd += ['--vocab', str(args.vocab), '--exp', str(root)]
    if spin:
        cmd += ['--test-spin-prompts', '--arch', 'transformer:514']
    cmd += ['--device', args.device]
    run(cmd, output_filename=root / 'train.log')
    return True


# ------------------------------------------------------- query logic


def query_hours(ranked_df, max_seconds=10 * 60 * 60):
    """Take top-ranked rows until the duration budget is crossed (the
    crossing row is included). Deviation: the reference accumulates the
    NEXT row's seconds after incrementing (ha/active_loop.py:149-158 —
    row 0 is never counted and the final row indexes out of range), so
    its hour budgets overshoot by up to one utterance plus the first
    row's whole duration; here each included row counts exactly once."""
    end, seconds = 0, 0.0
    while end < len(ranked_df):
        seconds += ranked_df.iloc[end].seconds
        end += 1
        if seconds > max_seconds:
            break
    return ranked_df.iloc[:end]


def perform_query(ranked_df, duration, query_size: str, is_final=False):
    ranked_df = ranked_df.reset_index()[['media_filename', 'text']] \
        .set_index('media_filename')
    ranked_df = ranked_df.merge(duration, on='media_filename')
    if is_final:
        out = ranked_df
    elif query_size.endswith('h'):
        out = query_hours(ranked_df,
                          max_seconds=int(query_size[:-1]) * 3600)
    else:
        out = ranked_df.head(int(query_size))
    return out[['media_filename', 'text']].set_index('media_filename')


def execute_query(query, oracle, prev_corrupted_dataset, prev_clean=None,
                  exp=None):
    """Fulfill the query from the oracle; rewrite corrupted/clean/combined
    dataset files; report label/word error between versions."""
    oracle_hit = oracle[oracle['media_filename'].isin(query.index)]

    if exp is not None:
        print('# writing', exp / 'query_result.txt.piece', file=sys.stderr)
        oracle_hit.to_csv(exp / 'query_result.txt.piece', sep='\t',
                          header=False, index=False)

    print('# computing errors between oracle query result and previously '
          'corrupted dataset', file=sys.stderr)
    for tag, join_bpe in (('LER', False), ('WER', True)):
        df = compute_wer_pointwise(
            oracle_hit[['media_filename', 'text']],
            prev_corrupted_dataset[['media_filename', 'text']],
            join_bpe=join_bpe)
        print(*format_wer(df, tag=tag), file=sys.stderr)

    remaining = prev_corrupted_dataset[
        ~prev_corrupted_dataset['media_filename'].isin(query.index)]
    if exp is not None:
        print('# writing remaining corrupted data',
              exp / 'corrupted.txt.piece', file=sys.stderr)
        remaining.to_csv(exp / 'corrupted.txt.piece', sep='\t', header=False,
                         index=False)

    clean = oracle_hit if prev_clean is None else \
        pd.concat([prev_clean, oracle_hit])
    if exp is not None:
        print('# writing', exp / 'clean.txt.piece', file=sys.stderr)
        clean.to_csv(exp / 'clean.txt.piece', sep='\t', header=False,
                     index=False)

    combined = pd.concat([clean, remaining])
    print('# computing errors between new combined dataset and oracle',
          file=sys.stderr)
    for tag, join_bpe in (('GLER', False), ('GWER', True)):
        df = compute_wer_pointwise(combined[['media_filename', 'text']],
                                   oracle, join_bpe=join_bpe)
        print(*format_wer(df, tag=tag), file=sys.stderr)

    if exp is not None:
        path = exp / 'combined_train.txt.piece'
        print('# writing combined dataset', path, file=sys.stderr)
        combined.to_csv(path, sep='\t', header=False, index=False)
        return path
    return None


def perform_egl(args, exp, combined_train, corrupted,
                prev_corrupted_dataset):
    """Train, decode the train set (dropout attempts), compute per-sample
    grad norms via hac --grad-norms, rank utterances by EGL."""
    just_trained = train(exp, combined_train, args.eval, corrupted, args,
                         test_attempts=20)
    train_hyps = training_log_to_dataset(exp / 'train.log')
    grad_norms_dataset = train_hyps.join(prev_corrupted_dataset)

    if not (exp / 'grads.txt').exists() or just_trained:
        print('# writing', exp / 'hyp.txt.piece', file=sys.stderr)
        grad_norms_dataset[['media_filename', 'hyp_text']].to_csv(
            exp / 'hyp.txt.piece', sep='\t', header=False, index=False)
        print('# computing gradient norms', file=sys.stderr)
        run(HAC + ['--grad-norms', f'fbank:{exp / "hyp.txt.piece"}',
                   '--device', args.device,
                   '--init', str(exp / 'last.pt'),
                   '--vocab', str(args.vocab)],
            output_filename=exp / 'grads.txt')
    else:
        print('# using existing', exp / 'grads.txt', file=sys.stderr)
        run(["wc", "-l", str(exp / 'grads.txt')])

    grad_norms_df = pd.concat([grad_norms_dataset.reset_index(),
                               read_grads(exp / 'grads.txt')], axis=1)
    query = estimate_egl(grad_norms_df)
    print('# writing utterance scores to', exp / 'egl', file=sys.stderr)
    query.to_csv(exp / 'egl', sep='\t', header=False)
    merged = prev_corrupted_dataset.set_index('media_filename').merge(
        query, left_index=True, right_index=True)
    # merge preserves the LEFT (corpus) row order, silently discarding
    # estimate_egl's descending sort — the reference returns the merge
    # unsorted (ha/active_loop.py:209-210), so its 'egl' strategy ends
    # up querying in corpus order; re-rank by EGL as intended
    return merged.sort_values('product', ascending=False)


def log_prob_advantage(neg_log, neg_set, pos_log, pos_set, *,
                       prev_corrupted_dataset, args, duration,
                       is_final=False):
    neg_hyp = test_log_to_dataset(Path(neg_log)).rename(
        columns={'text': 'hyp_text'})
    pos_hyp = test_log_to_dataset(Path(pos_log)).rename(
        columns={'text': 'hyp_text'})
    neg = read_text(Path(neg_set)).merge(neg_hyp, on='dataset_index') \
        .set_index('media_filename')
    pos = read_text(Path(pos_set)).merge(pos_hyp, on='dataset_index') \
        .set_index('media_filename')

    pool = prev_corrupted_dataset.copy().set_index('media_filename')
    e_neg = neg.groupby(neg.index).log_prob.mean() \
        .rename('neg_expected_log_prob')
    e_pos = pos.groupby(pos.index).log_prob.mean() \
        .rename('pos_expected_log_prob')

    lp_query = pool.merge(e_neg, left_index=True, right_index=True) \
        .sort_values('neg_expected_log_prob',
                     key=lambda x: -x.astype(float), ascending=False)
    adv = (e_neg - e_pos).rename('advantage')
    adv_query = pool.merge(adv, left_index=True, right_index=True) \
        .sort_values('advantage', ascending=False)

    print('# rank correlation between log_prob and advantage',
          rank_corr(lp_query, adv_query), file=sys.stderr)
    a = perform_query(adv_query, duration=duration,
                      query_size=args.query_size, is_final=is_final)
    b = perform_query(lp_query, duration=duration,
                      query_size=args.query_size, is_final=is_final)
    iou = len(set(a.index) & set(b.index)) / \
        max(len(set(a.index) | set(b.index)), 1)
    print('# IoU between log_prob and advantage queries', iou,
          file=sys.stderr)
    return adv_query


def run_step(args, exp, *, prev=None, is_final=False):
    oracle = read_text(args.oracle)
    duration = pd.read_csv(args.duration, sep='\t',
                           names=['media_filename', 'seconds'])

    if prev is not None:
        print('# continuing from', prev, 'in', exp, file=sys.stderr)
        combined_train = prev / 'combined_train.txt.piece'
        assert combined_train.exists(), f'{combined_train} does not exist'
        corrupted = prev / 'corrupted.txt.piece'
        prev_corrupted_dataset = read_text(corrupted)
        prev_clean = read_text(prev / 'clean.txt.piece')
    else:
        print('# starting from scratch', exp, file=sys.stderr)
        corrupted = combined_train = args.initial_corrupted
        prev_corrupted_dataset = read_text(args.initial_corrupted)
        prev_clean = None

    exp.mkdir(exist_ok=True, parents=True)

    match args.strategy:
        case ['random']:
            query = prev_corrupted_dataset.sample(
                frac=1, replace=False, random_state=args.seed)
        case ['oracle-max-wer']:
            df = compute_wer_pointwise(prev_corrupted_dataset, oracle)
            df['text'] = df['text_ref']
            query = df.sort_values('total', ascending=False)
        case ['long']:
            query = prev_corrupted_dataset.copy()
            query['sizes'] = query['text'].str.count(' ') + 1
            query = query.sort_values(by='sizes', ascending=False)
        case ['entropy' | 'prob' as strat]:
            # deviations from the reference (ha/active_loop.py:246-261):
            # (a) stats are averaged over decode attempts per utterance
            #     (the reference keeps one row PER attempt — with
            #     test_attempts=40 its 'prob' query is 40 duplicate rows
            #     per utterance and hour budgets sum each utterance 40x;
            #     its own 'logfile' strategy shows the intended mean);
            # (b) ranking is restricted to the remaining corrupted pool
            #     (the reference ranks the FULL oracle set — its own
            #     '# why oracle?' comment — so later rounds can re-query
            #     already-cleaned utterances), like every other strategy
            train(exp / 'entropy_prob', combined_train, args.eval,
                  args.oracle, args,
                  **(dict(seed=args.seed, test_attempts=40)
                     if strat == 'prob' else {}))
            stats = test_log_to_dataset(exp / 'entropy_prob/train.log')
            stats = stats.groupby(stats.index).mean(numeric_only=True)
            df = pd.concat([oracle, stats], axis=1)
            df = df[df['media_filename'].isin(
                prev_corrupted_dataset['media_filename'])]
            if strat == 'entropy':    # most-uncertain first
                query = df.sort_values('entropy_per_token',
                                       ascending=False)
            else:                      # least-confident first
                query = df.sort_values('log_prob_per_token',
                                       ascending=True)
        case ['spin']:
            train(exp / 'spin', combined_train, args.eval, combined_train,
                  args, spin=True)
            df = test_log_to_dataset(exp / 'spin/train.log')
            df = df[df['prompt'] == '<↓>']
            df = read_text(combined_train).merge(df, on='dataset_index')
            query = df.sort_values('log_prob_per_token',
                                   key=lambda x: -x.astype(float),
                                   ascending=False)
        case ['egl']:
            query = perform_egl(args, exp, combined_train, corrupted,
                                prev_corrupted_dataset)
        case ['logfile', log_filename, test_dataset]:
            df = test_log_to_dataset(Path(log_filename))
            means = df.groupby(df.index).log_prob.mean() \
                .rename('log_prob_mean')
            df = read_text(Path(test_dataset)).merge(
                means, on='dataset_index')
            query = prev_corrupted_dataset.set_index('media_filename') \
                .merge(df.set_index('media_filename'), left_index=True,
                       right_index=True)
            query['text'] = query['text_x']
            query = query.drop(columns=['text_x', 'text_y']).reset_index()
            query = query.sort_values('log_prob_mean',
                                      key=lambda x: -x.astype(float),
                                      ascending=False)
        case ['advantage', neg_log, neg_set, pos_log, pos_set]:
            query = log_prob_advantage(
                neg_log, neg_set, pos_log, pos_set,
                prev_corrupted_dataset=prev_corrupted_dataset, args=args,
                duration=duration, is_final=is_final)
        case _:
            raise ValueError(f'unknown strategy {args.strategy}')

    print(query, flush=True)
    query = perform_query(query, duration=duration,
                          query_size=args.query_size, is_final=is_final)
    print('# queried', len(query), 'clean utterances, query size was',
          args.query_size, file=sys.stderr)
    if is_final:
        print('# final query', file=sys.stderr)
    assert len(query) > 0, "query size is zero, something is wrong"
    assert len(query) < 10000, "query size is too large, something is wrong"

    return execute_query(query, oracle, prev_corrupted_dataset,
                         prev_clean=prev_clean, exp=exp)


def main():
    args = make_parser().parse_args()
    np.random.seed(args.seed)

    # the LAST step that will actually execute gets is_final (query the
    # entire remaining pool) — including a --steps 1 run whose only step
    # is step 0, and runs cut short by --stop-before (the reference only
    # flags the nominal last step, and never on the step-0 branch)
    last_step = args.start + args.steps - 1
    if args.stop_before is not None:
        last_step = min(last_step, args.stop_before - 1)
    for step in range(args.start, args.start + args.steps):
        if args.stop_before is not None and step >= args.stop_before:
            print('# stopping before', step, file=sys.stderr)
            break
        exp = args.exp / f'{step:02d}'
        if step == 0:
            train_path = run_step(args, exp, is_final=step == last_step)
        else:
            prev = args.exp / f'{step - 1:02d}'
            train_path = run_step(args, exp, prev=prev,
                                  is_final=step == last_step)
        if args.train:
            train(exp / 'post', train=train_path, eval=args.eval, test=None,
                  args=args)


if __name__ == '__main__':
    main()

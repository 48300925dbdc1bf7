'use strict';
// Minimal highland@2.5 shim covering EXACTLY the stream combinators
// /root/reference/geonames.js uses: H(streamOrArray), .split, .compact,
// .map, .filter, .flatten, .each, .nfcall, .series, .parallel, .errors,
// .done, and H.curry. STREAMING (async-generator pipeline, r14): real
// highland is incremental, and the r13 eager shim (whole file as one
// string) capped out near V8's ~512 MB string limit — an 8M-row
// allCountries.txt is ~1 GB, so the full-dump parity run needs
// constant-memory flow. Row functions still run one-at-a-time in input
// order, matching .series(); results per stage are identical to the
// eager form for finite inputs (split carries partial lines across
// chunks and always emits the final piece, exactly like
// join('').split(/\r?\n/)).
//
// SCOPE CAVEAT (recorded in REFPARITY_r*.json): real highland's
// .errors(cb) CONSUMES an error and lets the stream continue; this shim
// stops at the first error after reporting it. In the reference's own
// usage the distinction is unobservable for step success/failure — all
// three .errors(callback) sites hand the error to the ETL step callback, so
// the step fails on the first error either way; the assertion pins THAT
// the reference's own line throws, not how much tail real highland
// would still process. Second deviation (same class): because _errCb
// rides along to derived Shims, a throw from a combinator attached
// AFTER .errors(cb) is also handed to cb, where real highland only
// routes UPSTREAM errors through .errors and would let a downstream
// throw crash the terminal. Unobservable for geonames.js — all three
// .errors sites are chain-terminal (.errors(...).done(...)) with no
// combinator in between — and the full-dump crash pin reproduces the
// reference's geonames.js:107 TypeError at the same record either way.

async function* fromSource(src) {
  if (Array.isArray(src)) {
    yield* src.slice();
    return;
  }
  // Node Readable streams are async-iterable; decode buffers to utf8
  for await (const c of src) {
    yield typeof c === 'string' ? c : c.toString('utf8');
  }
}

class Shim {
  constructor(it) { this.it = it; }

  // every combinator derives a NEW Shim; an .errors(cb) handler
  // registered earlier in the chain must ride along or a later
  // combinator silently sheds it (r14 ADVICE find)
  _next(it) { const s = new Shim(it); s._errCb = this._errCb; return s; }

  split() {
    const it = this.it;
    return this._next((async function* () {
      let carry = '';
      for await (const chunk of it) {
        const parts = (carry + chunk).split(/\r?\n/);
        carry = parts.pop();
        yield* parts;
      }
      yield carry; // join('').split() keeps the final (possibly '') piece
    })());
  }

  compact() {
    const it = this.it;
    return this._next((async function* () {
      for await (const x of it) if (x) yield x;
    })());
  }

  map(fn) {
    const it = this.it;
    return this._next((async function* () {
      for await (const x of it) yield fn(x);
    })());
  }

  filter(fn) {
    const it = this.it;
    return this._next((async function* () {
      for await (const x of it) if (fn(x)) yield x;
    })());
  }

  flatten() {
    const it = this.it;
    async function* flat(xs) {
      for (const x of xs) {
        if (Array.isArray(x)) yield* flat(x);
        else yield x;
      }
    }
    return this._next((async function* () {
      for await (const x of it) {
        if (Array.isArray(x)) yield* flat(x);
        else yield x;
      }
    })());
  }

  each(fn) {
    // LAZY (unlike real highland, which self-consumes): fn's side
    // effects run only when a terminal .done() drains the chain —
    // every geonames.js .each() is immediately followed by .done()
    const it = this.it;
    return this._next((async function* () {
      for await (const x of it) { fn(x); yield x; }
    })());
  }

  nfcall(args) {
    // each element is a (possibly curried) node-style fn awaiting
    // `...args, callback`; a SYNCHRONOUS throw inside it becomes a
    // stream error, like highland's
    const it = this.it;
    return this._next((async function* () {
      for await (const f of it) {
        yield () => new Promise((res, rej) => {
          try { f(...args, (err, val) => (err ? rej(err) : res(val))); }
          catch (e) { rej(e); }
        });
      }
    })());
  }

  series() {
    const it = this.it;
    return this._next((async function* () {
      for await (const t of it) yield await t();
    })());
  }

  parallel(_n) {
    // the reference only uses parallel(2) for two INDEPENDENT
    // admin-code loads into disjoint dicts — scheduling-only difference
    return this.series();
  }

  errors(cb) { this._errCb = cb; return this; }

  done(cb) {
    const it = this.it;
    (async () => {
      // eslint-disable-next-line no-unused-vars
      for await (const _ of it) { /* drain */ }
    })().then(() => cb(), err => {
      if (this._errCb) this._errCb(err);
      else { throw err; }
    });
  }
}

function H(src) { return new Shim(fromSource(src)); }

H.curry = function (fn, ...args) {
  // highland ncurry over fn.length: partial until the arity is met
  if (args.length >= fn.length) return fn(...args);
  return (...more) => H.curry(fn, ...args.concat(more));
};

module.exports = H;

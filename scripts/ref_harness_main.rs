// Differential-test harness over the REFERENCE's own std-only modules
// (raw_byte, lexer, parser, object, cross_reference, trailer, util —
// header/image need external crates and are excluded). Compiled with
// plain rustc (no network/cargo), modules included by #[path] from the
// read-only /root/reference tree; nothing is copied.
//
// Usage: ref_harness lex <file>    -> one line per token (or ERR line)
//        ref_harness trailer <file> -> trailer fields (or ERR line)
// Output is a stable text form compared 1:1 against the Python port by
// tests/test_reference_differential.py.

#![allow(dead_code)]

mod cross_reference;
mod lexer;
mod object;
mod parser;
mod raw_byte;
mod trailer;
mod util;

use lexer::TokenContent;

fn fmt_bytes(v: &Vec<u8>) -> String {
    v.iter()
        .map(|b| format!("{:02x}", b))
        .collect::<Vec<_>>()
        .join("")
}

fn main() {
    let args: Vec<String> = std::env::args().collect();
    let mode = &args[1];
    let path = &args[2];
    let buf = std::fs::read(path).unwrap();

    if mode == "lex" {
        run_lex(&buf);
        return;
    }

fn fmt_dict(o: &object::PdfDict, off: u64) -> String {
    let mut pairs: Vec<String> = o
        .iter()
        .map(|(k, v)| format!("{}: {}", k, fmt_obj(v)))
        .collect();
    pairs.sort();
    format!("dict {{{}}} @{}", pairs.join(", "), off)
}

fn fmt_obj(obj: &parser::Object) -> String {
    // stable text form of an object tree; dict keys sorted for
    // HashMap-order independence; string payloads are checked at the
    // lexer level (private field here)
    use object::PdfObject;
    match obj {
        parser::Object::Boolean(o) => format!("bool {} @{}", o.unpack(), o.byte_offset()),
        parser::Object::Integer(o) => format!("int {} @{}", o.unpack(), o.byte_offset()),
        parser::Object::Real(o) => format!("real {:?} @{}", o.unpack(), o.byte_offset()),
        parser::Object::Name(o) => format!("name {} @{}", o.as_str(), o.byte_offset()),
        parser::Object::String(o) => format!("string @{}", o.byte_offset()),
        parser::Object::Null(o) => format!("null @{}", o.byte_offset()),
        parser::Object::IndirectRef(o) => {
            let (n, g) = o.unpack();
            format!("ref {} {} @{}", n, g, o.byte_offset())
        }
        parser::Object::Array(o) => {
            let items: Vec<String> = o.into_iter().map(fmt_obj).collect();
            format!("array [{}] @{}", items.join(", "), o.byte_offset())
        }
        parser::Object::Dict(o) => fmt_dict(o, o.byte_offset()),
        parser::Object::IndirectObj(o) => {
            format!("iobj {} @{}", fmt_obj(o.get_object()), o.byte_offset())
        }
        parser::Object::StreamObj(o) => {
            format!("stream {} @{}", fmt_dict(&o.dict, o.dict.byte_offset()), o.byte_offset())
        }
    }
}

fn fmt_token(tok: &lexer::Token) -> String {
    let desc = match tok.content() {
                        TokenContent::Eol => "eol".to_string(),
                        TokenContent::Boolean(b) => format!("bool {}", b),
                        TokenContent::Integer(i) => format!("int {}", i),
                        TokenContent::Real(r) => format!("real {:?}", r),
                        TokenContent::HexStr(v) => format!("hexstr {}", fmt_bytes(v)),
                        TokenContent::String(v) => format!("str {}", fmt_bytes(v)),
                        TokenContent::Name(s) => format!("name {}", s),
                        TokenContent::DictStart => "dict_start".to_string(),
                        TokenContent::DictEnd => "dict_end".to_string(),
                        TokenContent::ArrayStart => "arr_start".to_string(),
                        TokenContent::ArrayEnd => "arr_end".to_string(),
                        TokenContent::Null => "null".to_string(),
                        TokenContent::IndirectRef(o, g) => format!("iref {} {}", o, g),
                        TokenContent::IndirectObjStart(o, g) => {
                            format!("iobj_start {} {}", o, g)
                        }
                        TokenContent::IndirectObjEnd => "iobj_end".to_string(),
        TokenContent::StreamObjStart(off) => {
            format!("stream_start {}", off)
        }
    };
    format!("{} @{}", desc, tok.byte_offset)
}

fn run_lex(buf: &[u8]) {
    let mut lx = lexer::Lexer::new(buf, 0);
    match lx.tokenize() {
        Ok(()) => {
            for tok in &lx.token_vec {
                println!("{}", fmt_token(tok));
            }
            println!("UNBALANCED {}", lx.has_unbalanced_indirectobj());
        }
        Err(e) => println!("ERR {}", e),
    }
}

    if mode == "lexmany" {
        // each input line: hex-encoded buffer; one output block per
        // input, terminated by a ==== line (batch differential mode)
        let text = String::from_utf8(buf).unwrap();
        for line in text.lines() {
            let bytes: Vec<u8> = (0..line.len())
                .step_by(2)
                .map(|i| u8::from_str_radix(&line[i..i + 2], 16).unwrap())
                .collect();
            if bytes.is_empty() {
                println!("EMPTY");
                println!("====");
                continue;
            }
            let mut lx = lexer::Lexer::new(&bytes, 0);
            match lx.tokenize() {
                Ok(()) => {
                    for tok in &lx.token_vec {
                        println!("{}", fmt_token(tok));
                    }
                    println!("UNBALANCED {}", lx.has_unbalanced_indirectobj());
                }
                Err(e) => println!("ERR {}", e),
            }
            println!("====");
        }
        return;
    }

    if mode == "parsemany" {
        let text = String::from_utf8(buf).unwrap();
        for line in text.lines() {
            let bytes: Vec<u8> = (0..line.len())
                .step_by(2)
                .map(|i| u8::from_str_radix(&line[i..i + 2], 16).unwrap())
                .collect();
            if bytes.is_empty() {
                println!("EMPTY");
                println!("====");
                continue;
            }
            match parser::Parser::new(&bytes, 0) {
                Ok(mut p) => match p.parse() {
                    Ok(obj) => println!("{}", fmt_obj(&obj)),
                    Err(e) => println!("ERR {}", e),
                },
                Err(e) => println!("ERR {}", e),
            }
            println!("====");
        }
        return;
    }

    if mode == "skelbench" {
        // throughput of the shared document-skeleton subset (header is
        // regex-crate-bound and excluded): trailer parse + xref load +
        // root catalog resolve, repeated N times over one file
        let n: usize = args[3].parse().unwrap();
        let mut file = std::fs::File::open(path).unwrap();
        let size = file.metadata().unwrap().len();
        let t0 = std::time::Instant::now();
        for _ in 0..n {
            let t = trailer::parse_trailer(&mut file, size).unwrap();
            let xref = cross_reference::XRef::new(&mut file, t.xref_start_offset).unwrap();
            let root_ref = t.get_root_catalog_ref();
            let obj = root_ref.get_indirect_obj(&mut file, &xref).unwrap();
            std::hint::black_box(&obj);
        }
        let dt = t0.elapsed().as_secs_f64();
        println!("{{\"docs\": {}, \"sec\": {:.4}, \"docs_per_sec\": {:.0}}}", n, dt, n as f64 / dt);
        return;
    }

    if mode == "trailer" {
        let mut file = std::fs::File::open(path).unwrap();
        let size = file.metadata().unwrap().len();
        match trailer::parse_trailer(&mut file, size) {
            Ok(t) => {
                let r = t.get_root_catalog_ref();
                let (num, gen) = r.unpack();
                println!("xref_start {}", t.xref_start_offset);
                println!("root {} {}", num, gen);
            }
            Err(e) => println!("ERR {}", e),
        }
        return;
    }

    eprintln!("unknown mode {}", mode);
    std::process::exit(2);
}

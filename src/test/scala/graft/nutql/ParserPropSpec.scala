package graft.nutql

import org.scalacheck.{Gen, Properties, Prop}
import org.scalacheck.Prop.forAll
import graft.nutql.Ast._

/** ScalaCheck properties over the parser (SURVEY §5): parse-time boolean
  * folding agrees with direct evaluation, and the arithmetic precedence
  * ladder agrees with a reference evaluator.
  */
object ParserPropSpec extends Properties("Parser") {

  // ---- property 1: boolean-literal expressions fold to their value ----

  private sealed trait B { def sql: String; def eval: Boolean }
  private case class BLit(b: Boolean) extends B {
    def sql = b.toString; def eval = b
  }
  private case class BNot(e: B) extends B {
    def sql = s"not ${e.sql}"; def eval = !e.eval
  }
  private case class BBin(op: String, l: B, r: B) extends B {
    def sql = s"(${l.sql} $op ${r.sql})"
    def eval = op match {
      case "and" => l.eval && r.eval
      case "or" => l.eval || r.eval
      case _ => l.eval ^ r.eval
    }
  }

  private def genB(depth: Int): Gen[B] =
    if (depth <= 0) Gen.oneOf(true, false).map(BLit)
    else Gen.frequency(
      2 -> Gen.oneOf(true, false).map(BLit),
      1 -> Gen.lzy(genB(depth - 1).map(BNot)),
      3 -> Gen.lzy(for {
        op <- Gen.oneOf("and", "or", "xor")
        l <- genB(depth - 1); r <- genB(depth - 1)
      } yield BBin(op, l, r)))

  property("boolean constant folding agrees with evaluation") =
    forAll(genB(4)) { b =>
      Parser.parseExpression(b.sql) == BoolLit(b.eval)
    }

  // ---- property 2: arithmetic precedence matches reference evaluator ----

  private sealed trait A { def sql: String }
  private case class ALit(n: Int) extends A { def sql = n.toString }
  private case class ABin(op: String, l: A, r: A) extends A {
    def sql = s"${l.sql} $op ${r.sql}"
  }

  private def genA(depth: Int): Gen[A] =
    if (depth <= 0) Gen.choose(0, 100).map(ALit)
    else Gen.frequency(
      2 -> Gen.choose(0, 100).map(ALit),
      3 -> Gen.lzy(for {
        op <- Gen.oneOf("+", "-", "*", "&", "|", "^", "<<")
        l <- genA(depth - 1); r <- genA(depth - 1)
      } yield ABin(op, l, r)))

  // evaluate the parsed AST
  private def evalAst(e: Expr): BigInt = e match {
    case IntLit(n) => n
    case Binary(op, l, r) =>
      val (a, b) = (evalAst(l), evalAst(r))
      op match {
        case "+" => a + b
        case "-" => a - b
        case "*" => a * b
        case "&" => a & b
        case "|" => a | b
        case "^" => a ^ b
        case "<<" => a << (b.toInt & 63)
        case _ => sys.error(s"op $op")
      }
    case other => sys.error(s"unexpected $other")
  }

  // evaluate the flat token string with the NutQL ladder:
  // BitOr(7) < BitXor(8) < BitAnd(9) < Shift(10) < PlusMinus(11) < Mul(12)
  private def evalRef(tokens: List[Either[BigInt, String]]): BigInt = {
    def pow(op: String): Int = op match {
      case "|" => 7; case "^" => 8; case "&" => 9; case "<<" => 10
      case "+" | "-" => 11; case "*" => 12
    }
    // precedence climbing over the flat list
    var rest = tokens
    def parseAt(minPow: Int): BigInt = {
      var left = rest.head.left.getOrElse(sys.error("lit expected"))
      rest = rest.tail
      var going = true
      while (going) rest match {
        case Right(op) :: tl if pow(op) > minPow =>
          rest = tl
          val right = parseAt(pow(op))
          left = op match {
            case "+" => left + right
            case "-" => left - right
            case "*" => left * right
            case "&" => left & right
            case "|" => left | right
            case "^" => left ^ right
            case "<<" => left << (right.toInt & 63)
          }
        case _ => going = false
      }
      left
    }
    parseAt(0)
  }

  private def flatten(a: A): List[Either[BigInt, String]] = a match {
    case ALit(n) => List(Left(BigInt(n)))
    case ABin(op, l, r) => flatten(l) ++ (Right(op) :: flatten(r))
  }

  property("arithmetic/bitwise precedence matches reference ladder") =
    forAll(genA(4)) { a =>
      // the SQL string loses the generated tree shape; both sides must
      // re-associate it identically
      evalAst(Parser.parseExpression(a.sql)) == evalRef(flatten(a))
    }

  // ---- property 3: integer literals round-trip ----
  property("integer literals round-trip") =
    forAll(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)) { n =>
      Parser.parseExpression(n.toString) == IntLit(BigInt(n))
    }
}
